package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q207 Bloom semi-join decontamination: the no-false-negative
  * guarantee (exact-hit parity with the brute exact join), the
  * candidate ⊇ hit containment, the measured false-positive rate, and
  * the full-copy adversarial case.
  */
class BloomDeconSpec extends AnyFunSuite {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, sfDir)
  private def benchCond = col("doc_id") % 37 === 0 && col("doc_id") < 18500

  test("q207 exact hits == brute-force exact decontamination (no false negatives)") {
    val bloomHits = DedupQueries.q207BloomDecontaminate(spark, sfDir)
      .filter(col("n_hits") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val brute = DedupQueries.decontaminate(
        docs.filter(!benchCond), docs.filter(benchCond), broadcastBench = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloomHits === brute, "per-doc exact hit counts must match the exact join")
  }

  test("q207 candidates contain the hits and the realized FP rate is small") {
    val rows = DedupQueries.q207BloomDecontaminate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3),
        s"doc ${r.getLong(0)}: candidates must contain hits")
      assert(r.getLong(2) <= r.getLong(1),
        s"doc ${r.getLong(0)}: candidates cannot exceed shingles")
    }
    val fp = rows.map(r => r.getLong(2) - r.getLong(3)).sum.toDouble
    val total = rows.map(_.getLong(1)).sum.toDouble
    assert(fp / total < 0.02,
      s"realized FP rate ${fp / total} exceeds the m=2^20/k=3 design bound")
  }

  test("q207 adversarial full copy: a train doc equal to a bench doc is fully hit") {
    val bench = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // full copy
      (2L, "totally unrelated words that share no trigram at all here"))
      .toDF("doc_id", "text")
    val out = DedupQueries.bloomDecontaminate(train, bench)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getString(4))).toMap
    val (n1, h1, v1) = out(1L)
    assert(n1 === h1 && v1 === "contaminated", "full copy must hit on every shingle")
    assert(out(2L)._2 === 0L && out(2L)._3 === "clean")
  }
}
