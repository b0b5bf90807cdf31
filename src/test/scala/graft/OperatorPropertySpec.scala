package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5 property tests: invariants that must hold regardless of
  * fixture content. */
class OperatorPropertySpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("J5: left join on a unique right key preserves cardinality") {
    // constructed data: the fixture's lineitem does NOT enforce TPC-H key
    // uniqueness, so the invariant is asserted on a table that does
    import spark.implicits._
    val left = Seq((1, "a"), (2, "b"), (3, "c"), (3, "c2")).toDF("k", "v")
    val right = Seq((1, 10.0), (3, 30.0)).toDF("k", "w") // k unique
    assert(left.join(right, Seq("k"), "left").count() === left.count())
  }

  test("composite surrogate key is unique when its parts are (q16)") {
    val df = operators.RelationalQueries.q16CastsKeys(spark, sfDir)
    assert(df.select("cust_nation_key").distinct().count() === df.count())
  }

  test("exact dedup partitions the corpus (q21: group sizes sum to row count)") {
    val docs = Tables.documents(spark, sfDir).count()
    val agg = operators.DedupQueries.q21ExactDedup(spark, sfDir)
      .agg(sum("n_dups")).first().getLong(0)
    assert(agg === docs)
  }

  test("minhash near-dup pairs are ordered and above threshold (q22)") {
    val rows = operators.DedupQueries.q22MinhashLsh(spark, sfDir).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall { r => val j = r.getDouble(2); j >= 0.5 && j <= 1.0 })
  }

  test("cosine top-k returns exactly k ranked neighbors per probe (q25)") {
    val rows = operators.SimilarityQueries.q25CosineTopk(spark, sfDir).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.values.forall(_.length === 3))
    assert(rows.forall { r => val c = r.getDouble(3); c >= -1.0001 && c <= 1.0001 })
    // ranks descend in cosine within each probe
    byProbe.values.foreach { g =>
      val sorted = g.sortBy(_.getInt(2))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(w =>
        w.length < 2 || w(0) >= w(1)))
    }
  }

  test("LSH cosine pairs are a subset of threshold-passing pairs (q26)") {
    val rows = operators.SimilarityQueries.q26LshCosine(spark, sfDir).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.35))
  }

  test("approximate distinct stays within its error bound (q45)") {
    // run the sketch itself here — q45's own n_users column is the EXACT
    // count (the oracle-checkable shape), so comparing it to q38 would be
    // a tautology. The 5% bound is the tight fixture assertion; q45's
    // oracle-facing sketch_ok uses the 5-sigma 10% envelope.
    val approx = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = operators.RelationalQueries.q38TwoPhaseDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      assert(math.abs(a - n) / math.max(n, 1L) <= 0.05,
        s"$k: approx $a vs exact $n exceeds 5% (rsd=0.02 configured)")
    }
    // and the shipped query must report the sketch inside its envelope
    assert(operators.RelationalQueries.q45ApproxDistinct(spark, sfDir)
      .collect().forall(_.getBoolean(3)))
  }

  test("Lloyd training improves mean assignment cosine over the seed codebook (q37)") {
    import operators.SimilarityQueries
    val e = SimilarityQueries.normed(spark, sfDir)
    val seed = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("nrm").as("cn"))
    def meanCos(cb: org.apache.spark.sql.DataFrame): Double =
      SimilarityQueries.assign(e, cb).agg(avg("ccos")).first().getDouble(0)
    val before = meanCos(seed)
    val after = meanCos(SimilarityQueries.trainedCodebook(e))
    assert(after > before,
      s"trained codebook should fit the corpus better: before=$before after=$after")
  }

  test("KNN self-join returns dense ranks of above-threshold candidates (q80)") {
    val rows = operators.SimilarityQueries.q80KnnJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(3) >= 0.35))
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    }
  }

  test("cluster diagnostics account for every vector with coherent cosines (q83)") {
    val rows = operators.SimilarityQueries.q83ClusterDiagnostics(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.embeddings(spark, sfDir).count())
    rows.foreach { r =>
      val (mean, min) = (r.getDouble(2), r.getDouble(3))
      assert(min <= mean + 1e-9 && mean <= 1.0001,
        s"label ${r.getInt(0)}: mean=$mean min=$min")
    }
  }

  test("argmin window returns one row per partition key (q09)") {
    val df = operators.RelationalQueries.q09ArgminWindow(spark, sfDir)
    assert(df.select("user_id").distinct().count() === df.count())
  }

  test("grid argmin returns one nearest cell per station (q34)") {
    val df = operators.EtlQueries.q34GridArgmin(spark, sfDir)
    assert(df.count() === Tables.nation(spark, sfDir).count())
  }

  test("CC clusters match an independent union-find over the pair graph (q50)") {
    val pairs = operators.SimilarityQueries.q26LshCosine(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find with union-by-min: find(v) is the component
    // minimum — an implementation entirely unlike the distributed
    // label-propagation under test
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = verts.groupBy(find).map { case (root, vs) => root -> vs.length.toLong }
    val got = operators.SimilarityQueries.q50CcClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }
}
