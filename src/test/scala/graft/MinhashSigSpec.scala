package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_minhashsig must reproduce the q22 explode → 12-min-aggregate
  * signature exactly: same dual-md5 windows, same distinct-before-hash
  * semantics, same null handling. */
class MinhashSigSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val n = 12

  /** The explode+min reference signature of (id, toks) rows. */
  private def referenceSigs(df: org.apache.spark.sql.DataFrame) = {
    val sigCols = (0 until n)
      .map(i => min(expr(s"substring(h, ${i * 5 + 1}, 5)")).as(s"s$i"))
    df.select(col("id"),
        explode(expr("array_distinct(graft_shingles(toks, 3))")).as("x"))
      .select(col("id"),
        concat(md5(col("x")), md5(concat(lit("x"), col("x")))).as("h"))
      .groupBy("id").agg(sigCols.head, sigCols.tail: _*)
      .select(col("id") +: (0 until n).map(i => col(s"s$i")): _*)
  }

  private def nativeSigs(df: org.apache.spark.sql.DataFrame) = df
    .filter(expr("size(toks) >= 3"))
    .select(col("id"),
      expr(s"graft_minhashsig(graft_shingles(toks, 3), $n)").as("sig"))
    .select(col("id") +: (0 until n).map(i => col("sig")(i).as(s"s$i")): _*)

  test("native == explode+min on the corpus fixture") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
      .select(col("doc_id").as("id"), expr("split(text, ' ')").as("toks"))
      .filter(expr("size(toks) >= 3"))
    assert(nativeSigs(docs).exceptAll(referenceSigs(docs)).isEmpty)
    assert(referenceSigs(docs).exceptAll(nativeSigs(docs)).isEmpty)
  }

  test("native == explode+min on adversarial token arrays") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a", "b", "c")),                        // exactly one shingle
      (2L, Seq("a", "b", "c", "a", "b", "c", "a")),    // repeated shingles
      (3L, Seq("x", "x", "x", "x")),                   // degenerate repeats
      (4L, Seq("é", "漢", "😀", "word")),               // non-ASCII hashing
      (5L, (1 to 40).map(i => s"tok$i"))               // wide array
    ).toDF("id", "toks")
    assert(nativeSigs(docs).exceptAll(referenceSigs(docs)).isEmpty)
    assert(referenceSigs(docs).exceptAll(nativeSigs(docs)).isEmpty)
  }

  test("null array yields null; empty shingles yield all-null slots") {
    val r = spark.sql(
      "SELECT graft_minhashsig(CAST(NULL AS ARRAY<STRING>), 12)").first()
    assert(r.isNullAt(0))
    val e = spark.sql(
      "SELECT graft_minhashsig(CAST(ARRAY() AS ARRAY<STRING>), 12)").first()
    assert(e.getSeq[String](0) == Seq.fill(12)(null))
  }

  test("a bad n literal is a clean analysis error") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhashsig(ARRAY('a'), 13)").collect()
    }
    assert(err.getMessage.contains("graft_minhashsig"))
  }
}
