package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Positional-intersection phrase search (q104 core) on constructed
  * documents: exact adjacency (gap or reorder must not match), repeated
  * occurrences counted with the right first position, and the
  * single-token degenerate case. */
class PhraseSearchSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "big order scan x big order scan"),
    (2L, "big order x scan"),
    (3L, "scan order big"),
    (4L, "xx big order scan")
  ).toDF("doc_id", "text")

  test("exact adjacency with counts and first positions") {
    val out = TextAnalysisQueries
      .phraseSearch(docs, Seq("big", "order", "scan"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 0L), (4L, 1L, 1L)))
  }

  test("single-token phrase degenerates to a posting lookup") {
    val out = TextAnalysisQueries.phraseSearch(docs, Seq("x"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 3L), (2L, 1L, 2L)))
  }

  test("fixture results agree with a substring recount") {
    // independent recount: occurrences of the phrase as a token substring
    // via regexp on the raw text (anchored to token boundaries)
    val q = TextAnalysisQueries
      .q104PhraseSearch(spark, graft.SparkTestSession.sfDir)
      .as[(Long, Long, Long)].collect().map { case (d, n, _) => (d, n) }.toMap
    val expected = graft.Tables.documents(spark, graft.SparkTestSession.sfDir)
      .selectExpr("doc_id",
        "size(regexp_extract_all(concat(' ', text, ' '), ' big order scan(?= )', 0)) as n")
      .as[(Long, Int)].collect().filter(_._2 > 0).toMap
    assert(q.keySet === expected.keySet)
    q.foreach { case (d, n) => assert(n === expected(d).toLong, s"doc $d") }
  }
}
