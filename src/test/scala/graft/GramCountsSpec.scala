package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_gramcounts must reproduce the per-instance HOF gram explode's
  * aggregate exactly — same (g, k) universe, same totals. */
class GramCountsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def hofCounts(df: org.apache.spark.sql.DataFrame) = df
    .select(explode(expr("split(text, ' ')")).as("w"))
    .filter(length(col("w")) >= 1)
    .select(explode(expr(
      "flatten(transform(array(1, 2, 3), n -> " +
        "slice(transform(sequence(1, length(w)), " +
        "i -> struct(substring(w, i, n) as g, n as k)), " +
        "1, greatest(length(w) - n + 1, 0))))")).as("gk"))
    .groupBy(col("gk.g").as("g"), col("gk.k").as("k"))
    .agg(count(lit(1)).as("cnt"))

  private def nativeCounts(df: org.apache.spark.sql.DataFrame) = df
    .select(explode(expr("graft_gramcounts(text)")).as("gk"))
    .groupBy(col("gk.g").as("g"), col("gk.k").as("k"))
    .agg(sum(col("gk.cnt")).as("cnt"))

  test("native == HOF on the corpus fixture") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
    assert(nativeCounts(docs).exceptAll(hofCounts(docs)).isEmpty)
    assert(hofCounts(docs).exceptAll(nativeCounts(docs)).isEmpty)
  }

  test("native == HOF on adversarial tokenization (empty words, short words)") {
    import spark.implicits._
    val docs = Seq("", " ", "a", "ab abc", "  x  yz ", "aaa aa a",
      "word word word").toDF("text")
    assert(nativeCounts(docs).exceptAll(hofCounts(docs)).isEmpty)
    assert(hofCounts(docs).exceptAll(nativeCounts(docs)).isEmpty)
  }

  test("native == HOF on supplementary characters (surrogate pairs)") {
    import spark.implicits._
    // U+1F600 and U+10348 are outside the BMP: one code point, two
    // UTF-16 units. A UTF-16-stepping gram loop would split the pair
    // into lone surrogates; Spark's substring (and the HOF form) steps
    // by code point, so the native loop must too.
    val docs = Seq("😀ab", "a😀b c𐍈",
      "😀😀😀", "mixé𐍈é").toDF("text")
    assert(nativeCounts(docs).exceptAll(hofCounts(docs)).isEmpty)
    assert(hofCounts(docs).exceptAll(nativeCounts(docs)).isEmpty)
  }

  test("null text yields null (no rows after explode)") {
    val r = spark.sql("SELECT graft_gramcounts(CAST(NULL AS STRING))").first()
    assert(r.isNullAt(0))
  }
}
