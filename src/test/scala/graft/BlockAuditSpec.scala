package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_blockaudit must reproduce q270's seven HOF rule projections
  * exactly — same rule lattice, same integer division, same null
  * behavior through filter predicates and the aggregate fold. */
class BlockAuditSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val stop = "'the','a','of','and','to','is','in','it'"
  private val linky = "t -> t rlike '[0-9]' or substring(t, 1, 4) = 'http'"
  private val isContent = s"size(b) >= 6 and (100 * size(filter(b, $linky))) " +
    s"div size(b) <= 20 and size(filter(b, t -> t IN ($stop))) >= 1"

  private def hofCounters(df: org.apache.spark.sql.DataFrame) = df.select(
    col("id"),
    expr("cast(size(blocks) as bigint)").as("b_all"),
    expr("cast(size(filter(blocks, b -> size(b) < 6)) as bigint)").as("b_short"),
    expr(s"cast(size(filter(blocks, b -> (100 * size(filter(b, $linky)))" +
      " div size(b) > 20)) as bigint)").as("b_link"),
    expr(s"cast(size(filter(blocks, b -> size(filter(b, " +
      s"t -> t IN ($stop))) = 0)) as bigint)").as("b_nostop"),
    expr(s"cast(size(filter(blocks, b -> $isContent)) as bigint)").as("b_content"),
    expr(s"cast(aggregate(filter(blocks, b -> $isContent), 0L, " +
      "(acc, b) -> acc + size(b)) as bigint)").as("w_kept"),
    expr("cast(aggregate(blocks, 0L, (acc, b) -> acc + size(b)) as bigint)")
      .as("w_all"))

  private def nativeCounters(df: org.apache.spark.sql.DataFrame) = df
    .select(col("id"), expr(s"graft_blockaudit(blocks, array($stop))").as("a"))
    .select(col("id"), col("a.b_all"), col("a.b_short"), col("a.b_link"),
      col("a.b_nostop"), col("a.b_content"), col("a.w_kept"), col("a.w_all"))

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(nativeCounters(df).exceptAll(hofCounters(df)).isEmpty)
    assert(hofCounters(df).exceptAll(nativeCounters(df)).isEmpty)
  }

  test("native == HOF on the q270 page construction over the corpus") {
    val header = "split(concat('nav menu login search home page', " +
      "cast(doc_id % 100 as string), ' id', cast(doc_id % 7 as string), " +
      "' sitemap httpwww', cast(doc_id % 13 as string)), ' ')"
    val footer = "split(concat('copyright 2024 terms privacy', " +
      "cast(doc_id % 10 as string)), ' ')"
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
      .select(col("doc_id"), col("doc_id").as("id"),
        expr("split(text, ' ')").as("toks"))
      .select(col("id"), expr(
        s"concat(array($header), " +
          "transform(sequence(0, (size(toks) - 1) div 12), " +
          s"i -> slice(toks, i * 12 + 1, 12)), array($footer))").as("blocks"))
    assertSame(docs)
  }

  test("native == HOF on adversarial blocks (short, linky, stop-free, edge divisions)") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq(Seq("the", "cat", "sat", "on", "mat", "now"))),      // content
      (2L, Seq(Seq("short", "one"))),                                // short
      (3L, Seq(Seq("a1", "b2", "c3", "d4", "e5", "the"))),           // linky
      (4L, Seq(Seq("x", "y", "z", "w", "v", "u"))),                  // no-stop
      (5L, Seq(Seq("http", "htt", "httpx", "the", "five", "six"))),  // http prefixes
      (6L, Seq(Seq("the", "a", "of", "and", "to", "is", "in", "it"))),
      (7L, Seq.empty[Seq[String]]),                                  // empty page
      (8L, Seq(Seq("the", "b", "c", "d", "e", "1")))                 // exactly 1/6 linky
    ).toDF("id", "blocks")
    assertSame(docs)
  }

  test("null block and null token lattice matches the HOF form") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq(Seq("the", "cat", "sat", "on", "mat", "now"), null)),
      (2L, Seq(Seq("the", null, "sat", "on", "mat", "now")))
    ).toDF("id", "blocks")
    assertSame(docs)
  }
}
