package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Constructed-overlap fixture for the winnowed-posting substring-run
  * detector (q97's core): a known 40-char span shared by two documents at
  * DIFFERENT positions must surface as one same-offset run with the
  * arithmetically-predictable offset, a document sharing nothing
  * comparable must not pair, and sub-threshold incidental gram matches
  * must stay below the run bar. (The q97 oracle hash-checks the operator
  * against DuckDB on the fixture corpus; this spec pins the SEMANTICS on
  * inputs where the expected geometry is known exactly.)
  */
class SubstringRunsSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark
  import spark.implicits._

  private val shared = "the quick brown fox jumps over lazy dogs"
  private val pre1 = "zzz prefix one before "
  private val pre2 = "completely different opening text here "
  private lazy val docs = Seq(
    (1L, pre1 + shared + " tail alpha"),
    (2L, pre2 + shared + " end"),
    (3L, "unrelated content with no forty char overlap at all qqq vvv")
  ).toDF("doc_id", "text")

  test("a constructed 40-char overlap reports as one same-offset run; the outsider does not pair") {
    val runs = DedupQueries.substringRuns(docs, k = 4, w = 5,
      minPrints = 3L, dfCap = 64.0).collect()
    val pairs = runs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"the overlapping pair must be reported, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"doc 3 shares no span of threshold length, got $pairs")
    val r12 = runs.filter(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
      .maxBy(_.getLong(3))
    // gram positions are 1-based char positions, so the run's offset is
    // exactly the prefix-length difference
    assert(r12.getLong(2) === (pre1.length - pre2.length).toLong,
      s"offset must equal the prefix-length difference, got ${r12.getLong(2)}")
    assert(r12.getLong(5) >= 20L,
      s"the run span must cover most of the shared text, got ${r12.getLong(5)}")
  }

  test("documents with only sub-threshold incidental matches report no run") {
    val d = Seq(
      (10L, "abcdefghij klmnopqrst uvwxyzabcd"),
      (11L, "zyxwvutsrq ponmlkjihg fedcbazyxw")
    ).toDF("doc_id", "text")
    assert(DedupQueries.substringRuns(d, k = 4, w = 5,
      minPrints = 3L, dfCap = 64.0).collect().isEmpty)
  }
}
