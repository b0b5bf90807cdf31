package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The binned-quantile estimate must sit close to the exact percentile —
  * the error contract that makes q100 a usable substitute for q96's
  * exact sort at scale. The estimate is the lower edge of the bin
  * holding the target-rank VALUE, so it is within one bin width of that
  * value; the interpolated exact percentile can straddle one more bin
  * boundary, hence the 2x-width tolerance. (The oracle hash-checks the
  * binning arithmetic; this spec checks the APPROXIMATION against the
  * exact answer, which the oracle cannot do — the IvfRecallSpec
  * pattern.)
  */
class BinnedQuantileSpec extends AnyFunSuite {
  import graft.SparkTestSession.{sfDir, spark}

  test("binned p50/p95 sit within two bin widths of the exact percentiles") {
    val byLang = CorpusQueries.q100BinnedQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val exact = graft.Tables.documents(spark, sfDir)
      .selectExpr("lang", "cast(size(split(text, ' ')) as bigint) as ntok")
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.expr("percentile(ntok, 0.5)").as("p50"),
        org.apache.spark.sql.functions.expr("percentile(ntok, 0.95)").as("p95"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(exact.nonEmpty)
    exact.foreach { case (lang, p50, p95) =>
      val (a50, a95, width) = byLang(lang)
      assert(math.abs(a50 - p50) <= 2 * width,
        s"$lang p50: approx $a50 vs exact $p50 exceeds 2x bin width $width")
      assert(math.abs(a95 - p95) <= 2 * width,
        s"$lang p95: approx $a95 vs exact $p95 exceeds 2x bin width $width")
    }
  }
}
