package graft.operators

import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** The skew story of the LSH dedup family, proven on a DEGENERATE corpus
  * (30% of documents identical — one hot band key per band, the
  * boilerplate-crawl failure mode):
  *   - q22 with the bucket cap set: the hot buckets are dropped, smaller
  *     duplicate clusters still pair, AND the drop count surfaces through
  *     the `graft_lsh_bucket_cap` observation — recall loss from skew
  *     control is observable, never silent. (The corpus deliberately keeps
  *     a small surviving cluster: were the capped result EMPTY, AQE's
  *     empty-relation propagation would replace the executed plan — the
  *     CollectMetrics node included — before the observation surfaced.)
  *   - q22/q42 without the cap: results stay correct (the full hot clique
  *     comes back), and q42's band self-join — the one skew-prone SHUFFLE
  *     in the family — is split by AQE's skew-join handling once the hot
  *     partition crosses the thresholds.
  */
class LshSkewSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark

  private val hotN = 150
  private val coldN = 350
  private val smallIds = Seq(900L, 901L, 902L) // surviving 3-doc cluster

  /** documents.parquet layout: `hotN` identical docs (ids 0..hotN-1),
    * `coldN` token-disjoint docs, and one small identical cluster. */
  private lazy val corpusDir: String = {
    import spark.implicits._
    val hotText = "the quick brown fox jumps over the lazy dog again and again"
    val smallText = "a small duplicate cluster that must survive the bucket cap"
    val rows = (0 until hotN).map(i => (i.toLong, hotText)) ++
      (0 until coldN).map { i =>
        (hotN + i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")
      } ++ smallIds.map(id => (id, smallText))
    val dir = graft.Staging.fresh("skew")
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' as lang", "'synthetic' as source",
        "length(text) as n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def pairsOf(rows: Array[org.apache.spark.sql.Row]): Array[(Long, Long)] =
    rows.map(r => (r.getLong(0), r.getLong(1)))

  private def cliquePairs(rows: Array[org.apache.spark.sql.Row]): Array[(Long, Long)] =
    pairsOf(rows).filter { case (a, b) => a < hotN && b < hotN }

  /** Every physical node, descending through the AQE wrappers that hide
    * their subtrees as leaves (AdaptiveSparkPlan, query stages, reused
    * exchanges) — plain plan.collect stops at stage boundaries. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(allNodes)) ++ (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case r: ReusedExchangeExec => allNodes(r.child)
      case _ => Seq.empty
    })

  test("q22 without the cap returns the full hot clique") {
    val rows = DedupQueries.minhashLshPairs(spark, corpusDir, None).collect()
    val clique = cliquePairs(rows)
    assert(clique.length === hotN * (hotN - 1) / 2,
      s"all ${hotN * (hotN - 1) / 2} identical-doc pairs must survive, got ${clique.length}")
    assert(rows.forall(_.getDouble(2) >= 0.5))
  }

  test("q22 with the cap drops the hot buckets, keeps small clusters, reports the drop count") {
    @volatile var dropped: Option[Long] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("graft_lsh_bucket_cap")
          .foreach(r => dropped = Some(r.getLong(0)))
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val rows = DedupQueries.minhashLshPairs(spark, corpusDir, Some(100)).collect()
      assert(cliquePairs(rows).isEmpty, "capped hot buckets must produce no clique pairs")
      // the 3-doc cluster is under the cap and must still pair
      assert(pairsOf(rows).toSet === smallIds.combinations(2)
        .map { case Seq(a, b) => (a, b) }.toSet)
      val deadline = System.currentTimeMillis() + 10000
      while (dropped.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      // identical docs share all 6 band keys -> 6 over-cap buckets
      assert(dropped.contains(6L), s"expected 6 dropped buckets observed, got $dropped")
    } finally spark.listenerManager.unregister(listener)
  }

  test("q42 stays correct on the hot corpus and AQE splits the skewed band join") {
    import spark.implicits._
    // A corpus with one DOMINANT duplicate cluster: 600 identical docs put
    // ~2400 rows on four (band, bkey) keys while 400 distinct docs spread
    // ~1600 rows evenly — the hot reduce partitions sit far above the
    // median, the fixture-scale image of one boilerplate page crawled a
    // billion times.
    val skewHot = 600
    val hotText = "the quick brown fox jumps over the lazy dog again and again"
    val rows = (0 until skewHot).map(i => (i.toLong, hotText)) ++
      (0 until 400).map { i =>
        (skewHot + i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")
      }
    val skewDir = graft.Staging.fresh("skewhot")
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' as lang", "'synthetic' as source",
        "length(text) as n_chars")
      .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")

    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.shuffle.partitions",
      "spark.sql.files.maxPartitionBytes"
    ).map(k => k -> spark.conf.get(k))
    // Shrink the skew thresholds to fixture scale — the hot band partition
    // must cross them the same way a hot multi-GB partition crosses the
    // defaults on a cluster. These knobs recreate CLUSTER geometry in a
    // unit test, they don't make skew handling possible:
    //   - broadcast disabled: a broadcast join has no skewed exchange to
    //     split (at 100 TB the staged fingerprint side is far beyond any
    //     broadcast threshold on its own);
    //   - 16 shuffle partitions: at 4, cold rows pile high enough that the
    //     hot partition no longer clears factor x median;
    //   - 1KB coalesce targets (parallelismFirst off): with the defaults,
    //     parallelism-first coalescing collapses the kilobyte-scale staged
    //     write to ONE task -> ONE parquet file -> ONE mapper, and AQE can
    //     only split a skewed reduce partition by MAPPER ranges — a
    //     single-mapper shuffle is structurally unsplittable. A real staged
    //     write is far above these floors and spans many files either way;
    //   - 1KB file splits: each staged file must stay its own scan task for
    //     the mapper ranges to exist.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1KB")
    try {
      val df = DedupQueries.q42SimhashPairs(spark, skewDir)
      val clique = df.collect().count { case r =>
        r.getLong(0) < skewHot && r.getLong(1) < skewHot }
      assert(clique === skewHot * (skewHot - 1) / 2,
        "identical docs (hamming 0) must all pair despite the skew split")
      val skewJoins = allNodes(df.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec if j.isSkewJoin => j }
      assert(skewJoins.nonEmpty,
        "expected AQE to mark the band self-join as skew-split")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
