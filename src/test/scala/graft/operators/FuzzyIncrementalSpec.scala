package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q313's incremental contract: varianting only the new-customer batch
  * and joining against the standing index yields exactly the full-rebuild
  * pair stream — cross pairs (new customer ~ standing customer) and
  * delta-delta pairs included, far twins excluded. */
class FuzzyIncrementalSpec extends AnyFunSuite {

  private def custDf(rows: Seq[(Long, String, Int)]) = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("c_custkey", "c_name", "c_nationkey")
      .withColumn("c_acctbal", lit(0.0))
      .withColumn("c_mktsegment", lit("BUILDING"))
  }

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("ka", "kb").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted

  test("constructed delta: incremental == full rebuild; cross and delta-delta pairs surface") {
    // names: lev distance is measured on substring(c_name, 10)
    val base = custDf(Seq(
      (100L, "Customer#000000100", 1), (200L, "Customer#000000200", 1),
      (300L, "Customer#000000300", 2)))
    // 107 is within lev 2 of 100's suffix; 207/217 are within lev 2 of
    // each other but 207 is also within 2 of 200; 307 shares no nation
    // with its nearest name so nation blocking must exclude it
    val delta = custDf(Seq(
      (107L, "Customer#000000107", 1), (207L, "Customer#000000207", 1),
      (217L, "Customer#000000217", 1), (307L, "Customer#000000107", 3)))
    val stage = graft.Staging.fresh("fuzzyincspec")
    DedupQueries.fuzzyIndexBuild(spark, base, stage)
    val inc = collectPairs(DedupQueries.fuzzyDeltaUpdate(spark, delta, stage))
    val fullStage = graft.Staging.fresh("fuzzyfullspec")
    DedupQueries.fuzzyIndexBuild(spark, base.unionByName(delta), fullStage)
    val full = collectPairs(spark.read.parquet(s"$fullStage/pairs"))
    assert(inc == full)
    val set = inc.toSet
    assert(set((100L, 107L)), "standing~new cross pair")
    assert(set((207L, 217L)), "delta-delta pair")
    assert(!set.exists(p => p._1 == 307L || p._2 == 307L),
      "different-nation twin blocked by the nation key")
  }

  test("registered q313 == q106 on the fixture (same corpus, same scorecard)") {
    val a = SimilarityQueriesHelpers.rows(DedupQueries.q313FuzzyIncremental(spark, sfDir))
    val b = SimilarityQueriesHelpers.rows(DedupQueries.q106FuzzyEntityMatch(spark, sfDir))
    assert(a == b && a.nonEmpty)
  }
}

/** Row-to-string canonicalizer shared by the equality assertions. */
private object SimilarityQueriesHelpers {
  def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq
}
