package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The convergence-driven PageRank loop vs the oracle-checkable unroll.
  *
  * The two forms share the pass function (`prPass`) by construction, so
  * what these tests pin is the LOOP MECHANICS: per-pass localCheckpoints,
  * the cloned-session width, checkpoint release, and the rank-movement
  * observation must not change a single rank relative to the declarative
  * unrolled plan — and the observation-driven termination must actually
  * find the quantized fixpoint on a graph that needs more passes than the
  * registered q95 constant.
  *
  * Fixture graph: a 30-node chain feeding a 10-spoke hub. Rank mass takes
  * one pass per hop to travel the chain, so the distribution needs well
  * over 3 passes to settle — exactly the case the fixed unroll cannot
  * serve.
  */
class PagerankSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark
  import spark.implicits._

  private lazy val pairsDir: String = {
    val chain = (0L until 30L).sliding(2).map(w => (w.head, w.last)).toSeq
    val spokes = (31L to 40L).map(i => (30L, i))
    val d = graft.Staging.fresh("prspec")
    (chain ++ spokes).toDF("vec_a", "vec_b")
      .write.mode("overwrite").parquet(s"$d/pairs")
    s"$d/pairs"
  }

  private def rankSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("the convergence loop run for exactly 3 passes equals the unrolled q95 form") {
    val unrolled = rankSet(SimilarityQueries.pagerankUnrolled(spark, pairsDir, 3))
    // tolPicos = -1: movement is never <= -1, so the loop runs to maxPasses
    val (loop, passes) =
      SimilarityQueries.pagerankConverged(spark, pairsDir, tolPicos = -1L, maxPasses = 3)
    assert(passes == 3)
    assert(rankSet(loop) === unrolled)
  }

  test("rank-movement observation converges past the unroll depth") {
    // movement decays ~0.85x per pass from ~1.7e13 picounits; 2e11 is hit
    // around pass 29 — comfortably past the 3-pass unroll, comfortably
    // under the cap. (An exact-zero tolerance is NOT used: the integer
    // dynamics settle into a measured 198-picounit limit cycle, never a
    // strict fixpoint — see pagerankConverged's scaladoc.)
    val (ranks, passes) =
      SimilarityQueries.pagerankConverged(spark, pairsDir, tolPicos = 200000000000L)
    assert(passes > 3, s"the chain graph must need more than 3 passes, used $passes")
    assert(passes < 50, s"must converge before the pass cap, used $passes")
    val top = ranks.orderBy(desc("rank"), asc("v")).select("v").as[Long].head()
    assert(top === 30L, s"the hub must carry the top rank, got $top")
  }
}
