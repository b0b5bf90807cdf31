package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_shingles must reproduce the HOF word-shingle construction
  * exactly — same shingles, same order — on every guarded input shape
  * the dedup family feeds it. */
class WordShinglesSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def hof(df: org.apache.spark.sql.DataFrame, k: Int) = {
    // spell the k-ary concat_ws form the operators used: k = 3 and 5
    val expr3 = "transform(sequence(1, size(toks)-2), " +
      "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
    val expr5 = "transform(sequence(1, size(toks)-4), i -> " +
      "concat_ws(' ', toks[i-1], toks[i], toks[i+1], toks[i+2], toks[i+3]))"
    df.filter(size(col("toks")) >= k)
      .select(col("toks"), expr(if (k == 3) expr3 else expr5).as("sh"))
  }

  private def native(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .filter(size(col("toks")) >= k)
    .select(col("toks"), expr(s"graft_shingles(toks, $k)").as("sh"))

  test("native == HOF (values AND order) on the corpus fixture, k = 3 and 5") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
      .select(expr("split(text, ' ')").as("toks"))
    for (k <- Seq(3, 5)) {
      assert(native(docs, k).exceptAll(hof(docs, k)).isEmpty)
      assert(hof(docs, k).exceptAll(native(docs, k)).isEmpty)
    }
  }

  test("native == HOF on adversarial token arrays (empties, repeats, exact length)") {
    import spark.implicits._
    val docs = Seq(
      Seq("a", "b", "c"), Seq("a", "a", "a", "a"), Seq("", "x", ""),
      Seq("a", "b", "c", "d", "e"), Seq("w1", "w2", "w3", "w4", "w5", "w6"))
      .toDF("toks")
    for (k <- Seq(3, 5)) {
      assert(native(docs, k).exceptAll(hof(docs, k)).isEmpty)
      assert(hof(docs, k).exceptAll(native(docs, k)).isEmpty)
    }
  }

  test("short input yields an empty array; null input yields null") {
    val r = spark.sql("SELECT graft_shingles(array('a', 'b'), 3)").first()
    assert(r.getSeq[String](0).isEmpty)
    val rn = spark.sql(
      "SELECT graft_shingles(CAST(NULL AS ARRAY<STRING>), 3)").first()
    assert(rn.isNullAt(0))
  }

  test("null elements are skipped with concat_ws semantics") {
    val r = spark.sql(
      "SELECT graft_shingles(array('a', CAST(NULL AS STRING), 'c'), 3)").first()
    assert(r.getSeq[String](0) == Seq("a c"))
  }
}
