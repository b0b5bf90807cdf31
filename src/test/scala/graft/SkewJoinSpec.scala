package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Evidence for SCALE.md's skew claim: AQE's OptimizeSkewedJoin really
  * does split a hot key's partition at runtime in this session
  * configuration (it is the mitigation the library leans on for
  * candidate-join skew — LSH hot buckets, SemDeDup hot clusters, the
  * q134 profile's output). The test constructs a join where one key
  * holds ~40% of the left side, forces the shuffle path (no broadcast),
  * lowers the skew thresholds to fixture scale, and asserts both the
  * runtime skew split (skew=true in the final adaptive plan) AND that
  * the split preserves the exact join result. */
class SkewJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("AQE splits the hot key's partition and preserves the join result") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val left = spark.range(0, 200000)
        .select(when(col("id") % 5 < 2, 0L).otherwise(col("id") % 1000).as("k"),
          col("id").as("payload"))
      val right = spark.range(0, 1000)
        .select(col("id").as("k"), (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's own query execution (a count() would
      // build a different one and leave this adaptive plan unfinalized)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a runtime skew-split join in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("q211's (w1,w2) token join: a stop-wordy corpus skew-splits with the result preserved") {
    // q211's scaladoc defers hot-prefix skew (a corpus where one bigram
    // dominates — real text's "of the"/"in the" mass) to AQE's skew
    // split; this pins that deferral both ways on the REAL operator: the
    // split fires (skew=true in the final adaptive plan) and the split
    // changes nothing (bit-identical scores vs the same query with the
    // skew rule disabled) — the q134 pattern applied to the token family.
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // 98% of docs are pure stop-word runs -> the ("the","the") bigram
      // carries ~98% of the exploded stream. Two fixture subtleties both
      // bit during construction and are load-bearing: (a) a
      // single-partition local input gives each reduce partition ONE map
      // block, and a one-block partition cannot be subdivided — hence
      // repartition(16); (b) skew detection reads COMPRESSED shuffle
      // sizes, and a hot partition of near-identical rows compresses far
      // better than diverse cold keys — a "40% hot" mix therefore never
      // crosses factor x median, so the diverse docs are kept to 2%
      val docs = (0 until 2500).map { i =>
        if (i % 50 != 0) (i.toLong, Seq.fill(60)("the").mkString(" "))
        else (i.toLong, (0 until 60).map(j => s"w${(i * 61 + j * 7) % 997}").mkString(" "))
      }.toDF("doc_id", "text").repartition(16)

      // the REGISTERED path's shape: counts staged to parquet leaves,
      // then scored — the join children are bare shuffle stages
      val (c2p, c1p, v) = graft.operators.CorpusQueries.trainBigramLm(spark, docs)
      def staged() = graft.operators.CorpusQueries.bigramScore(
        graft.operators.CorpusQueries.bigrams(docs),
        spark.read.parquet(c2p), spark.read.parquet(c1p), v)

      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val skewed = staged()
      val withSplit = skewed.collect()
      val finalPlan = skewed.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected the hot-bigram partition to skew-split:\n${finalPlan.take(6000)}")

      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val unsplit = staged().collect()
      assert(withSplit.map(_.toString).sorted.toSeq ===
        unsplit.map(_.toString).sorted.toSeq,
        "the skew split must not change a single score")

      // NEGATIVE CONTROL — the discovery that motivated staging: with
      // the counts derived INLINE, the build side is a final aggregate
      // directly above its shuffle, and OptimizeSkewedJoin's pattern
      // (sort-merge join over bare shuffle stages) cannot match, so the
      // identical skewed corpus runs with NO split even when forced
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      try {
        val inline = graft.operators.CorpusQueries.bigramQuality(docs)
        inline.collect()
        val inlinePlan = inline.queryExecution.executedPlan.toString
        assert(!inlinePlan.contains("skew=true"),
          "inline-derived counts were believed unsplittable; if this now " +
            "fires, Spark's skew rule learned the aggregate-above-shuffle " +
            "shape and the staged-leaf rationale should be re-examined")
      } finally conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
