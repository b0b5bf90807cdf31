package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_chargrams must reproduce the HOF distinct-n-gram extraction
  * exactly — same grams, same first-appearance ORDER (the arrays are
  * compared as values, not as sets). */
class CharGramsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def hof(df: org.apache.spark.sql.DataFrame, n: Int) = df
    .filter(length(col("text")) >= n)
    .select(col("text"), expr(
      s"array_distinct(transform(sequence(1, length(text)-${n - 1}), " +
        s"i -> substring(text, i, $n)))").as("g"))

  private def native(df: org.apache.spark.sql.DataFrame, n: Int) = df
    .filter(length(col("text")) >= n)
    .select(col("text"), expr(s"graft_chargrams(text, $n)").as("g"))

  test("native == HOF (values AND order) on the corpus fixture, n = 4") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir).select("text")
    assert(native(docs, 4).exceptAll(hof(docs, 4)).isEmpty)
    assert(hof(docs, 4).exceptAll(native(docs, 4)).isEmpty)
  }

  test("native == HOF on adversarial text (repeats, exact-length, n = 1..3)") {
    import spark.implicits._
    val docs = Seq("aaaa", "abab", "abcd", "aa a", "    ", "xy",
      "the quick the quick").toDF("text")
    for (n <- 1 to 3) {
      assert(native(docs, n).exceptAll(hof(docs, n)).isEmpty)
      assert(hof(docs, n).exceptAll(native(docs, n)).isEmpty)
    }
  }

  test("short text yields an empty array; null text yields null") {
    val r = spark.sql("SELECT graft_chargrams('abc', 4)").first()
    assert(r.getSeq[String](0).isEmpty)
    val rn = spark.sql("SELECT graft_chargrams(CAST(NULL AS STRING), 4)").first()
    assert(rn.isNullAt(0))
  }

  test("a non-positive or non-literal n is a clean analysis error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_chargrams('abcd', 0)").collect()
    }
    assert(e.getMessage.contains("graft_chargrams"))
  }
}
