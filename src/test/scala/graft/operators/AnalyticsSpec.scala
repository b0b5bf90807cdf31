package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** Equivalence and invariant proofs for the round-9 third-wave operators
  * (q137-q142): each scalable form is checked against a brute-force or
  * native baseline, and the sampling/selection invariants that make the
  * arithmetic trustworthy at any scale are asserted directly.
  */
class AnalyticsSpec extends AnyFunSuite {

  test("q137 unpivot round-trips q44's pivot: melt(pivot(x)) == groupBy counts") {
    val tall = AnalyticsQueries.q137Unpivot(spark, sfDir)
    // dense grid: |days| x 5 rows
    val nDays = tall.select("d").distinct().count()
    assert(tall.count() == nDays * 5)
    // nonzero cells match a direct groupBy of the fact table
    val direct = graft.Tables.events(spark, sfDir)
      .groupBy(col("ts").cast("date").as("d"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val mismatches = tall.filter(col("cnt") > 0).as("t")
      .join(direct.as("g"), Seq("d", "event_type"), "full_outer")
      .filter(coalesce(col("t.cnt"), lit(-1)) =!= coalesce(col("g.cnt"), lit(-2)))
      .count()
    assert(mismatches == 0)
  }

  test("q138 two-phase median == native buffering percentile(0.5)") {
    val assembled = AnalyticsQueries.q138GroupMedian(spark, sfDir)
      .select("event_type", "median").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val native = AnalyticsQueries.groupMedianNative(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(assembled.keySet == native.keySet && assembled.nonEmpty)
    // (v_lo+v_hi)/2 vs native lo+(hi-lo)*0.5 — same value up to one ulp
    for ((t, m) <- assembled)
      assert(math.abs(m - native(t)) <= math.ulp(native(t)),
        s"median mismatch for $t: $m vs ${native(t)}")
  }

  test("q138 mode is the smallest value among the max-count ties") {
    val counts = graft.Tables.events(spark, sfDir)
      .groupBy("event_type", "value").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val brute = counts.groupBy(_._1).map { case (t, rows) =>
      val mx = rows.map(_._3).max
      t -> (rows.filter(_._3 == mx).map(_._2).min, mx)
    }
    val q = AnalyticsQueries.q138GroupMedian(spark, sfDir)
      .select("event_type", "mode_value", "mode_count").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(q == brute)
  }

  test("q140 weighted systematic sample: exactly k picks per language, " +
    "each doc within 1 of its ideal share") {
    val k = 16
    val picks = AnalyticsQueries.q140WeightedSample(spark, sfDir)
    val perLang = picks.groupBy("lang").agg(sum("n_picks").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = graft.Tables.documents(spark, sfDir)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(perLang.keySet == langs)
    assert(perLang.values.forall(_ == k), s"per-lang totals: $perLang")
    // weight-proportionality: n_picks in [floor(w*k/W), ceil(w*k/W) + 1)
    val totals = graft.Tables.documents(spark, sfDir)
      .groupBy("lang").agg(sum("n_chars").as("w_total"))
    val bad = picks.join(totals, "lang")
      .filter(col("n_picks") > expr(s"(w * $k) div w_total + 1"))
      .count()
    assert(bad == 0)
  }

  test("q141 oriented-wedge triangle count == canonical a<b<c brute force") {
    val row = AnalyticsQueries.q141TriangleCount(spark, sfDir).collect().head
    val brute = AnalyticsQueries.triangleBrute(spark, sfDir)
    assert(row.getAs[Long]("n_triangles") == brute)
    assert(row.getAs[Long]("n_triangles") > 0)
    // orientation bound: max oriented out-degree <= sqrt(2|E|) (the skew
    // guarantee that keeps wedge fanout bounded at any scale)
    val m = row.getAs[Long]("n_edges").toDouble
    assert(row.getAs[Long]("max_out_degree") <= math.sqrt(2 * m) + 1)
  }
}
