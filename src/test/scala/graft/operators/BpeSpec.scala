package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** BPE merge-round semantics on corpora where the expected rule sequence
  * is known exactly, plus the training invariant (each adopted rule
  * strictly shrinks the corpus token count). The q98 oracle hash-checks
  * the operator against DuckDB's independent string algebra; these tests
  * pin the MERGE semantics — leftmost non-overlapping application, tie
  * order, per-round recount — on constructed inputs.
  */
class BpeSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark
  import spark.implicits._

  test("the constructed corpus trains the predictable 3-rule sequence") {
    // two copies of "aaab": round 1 merges the self-pair "a a" (count 4,
    // leftmost non-overlap: [a,a,a,b] -> [aa,a,b], NOT [aa,aa?]);
    // round 2 ties ("aa a" vs "a b", both 2) and adopts the
    // lexicographically first "a b"; round 3 merges the remainder.
    val docs = Seq((1L, "aaab"), (2L, "aaab")).toDF("doc_id", "text")
    val out = TextAnalysisQueries.bpeTrainRounds(docs, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1, "a a", "aa", 4L, 6L),
      (2, "a b", "ab", 2L, 4L),
      (3, "aa ab", "aaab", 2L, 2L)))
  }

  test("property: every adopted rule strictly shrinks the corpus token count") {
    val rnd = new scala.util.Random(98)
    val docs = (1L to 40L).map { id =>
      (id, (0 until (3 + rnd.nextInt(8))).map { _ =>
        (0 until (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }.mkString(" "))
    }.toDF("doc_id", "text")
    val rows = TextAnalysisQueries.bpeTrainRounds(docs, 4).collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4)))
    assert(rows.length === 4)
    val initial = docs.selectExpr("sum(length(replace(text, ' ', '')))")
      .head().getLong(0)
    var before = initial
    rows.sortBy(_._1).foreach { case (round, cnt, after) =>
      assert(cnt >= 1L, s"round $round adopted a rule with no support")
      // each APPLIED merge removes one token; overlapping occurrences of a
      // self-pair (count 2 in "aaa", one merge applied) make the applied
      // number at most — not exactly — the support count
      assert(after < before && after >= before - cnt,
        s"round $round: token count must strictly fall by at most the " +
          s"support count ($before -> $after, cnt $cnt)")
      before = after
    }
  }
}
