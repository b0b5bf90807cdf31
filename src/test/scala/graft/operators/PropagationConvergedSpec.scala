package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q310's convergence contract (the q268 precedent applied to label
  * propagation): the Observation loop's first two rounds reproduce q302's
  * 2-round unroll exactly, the loop keeps going where the unroll stops
  * (the sf fixture's frontier runs to round 5), and a constructed chain
  * graph converges at its full depth with q302's tie-break rule. */
class PropagationConvergedSpec extends AnyFunSuite {

  private lazy val fin = {
    val seeds = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
      .select(col("vec_id").as("node"), col("label").cast("bigint").as("lbl"))
    val pairs = SimilarityQueries.stagedPairs(spark, sfDir)
    val edges = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
      .unionAll(pairs.select(col("vec_b").as("src"), col("vec_a").as("dst")))
    spark.read.parquet(SimilarityQueries.propagateConverged(
      spark, seeds, edges, graft.Staging.fresh("lpcspec")))
  }

  test("rounds 1 and 2 of the loop equal q302's 2-round unroll per label") {
    val byRound = fin.groupBy("lbl")
      .agg(sum(when(col("r") === 1L, 1L).otherwise(0L)).as("r1"),
        sum(when(col("r") === 2L, 1L).otherwise(0L)).as("r2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val unroll = SimilarityQueries.q302LabelPropagation(spark, sfDir)
      .filter(col("label") >= 0).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(unroll.nonEmpty && unroll.forall { case (lbl, (n1, n2)) =>
      byRound.getOrElse(lbl, (0L, 0L)) == ((n1, n2))
    })
  }

  test("the loop converges past the unroll: the fixture frontier outlives 2 rounds") {
    val maxRound = fin.agg(max("r")).head().getLong(0)
    assert(maxRound >= 3, s"fixture frontier should outlive the unroll, got $maxRound")
    val q310Unreached = SimilarityQueries.q310PropagationConverged(spark, sfDir)
      .filter(col("label") === -1L).head().getLong(4)
    val q302Unreached = SimilarityQueries.q302LabelPropagation(spark, sfDir)
      .filter(col("label") === -1L).head().getLong(4)
    assert(q310Unreached < q302Unreached,
      "the fixpoint must reach nodes the 2-round unroll reports unreached")
  }

  test("constructed chain converges at full depth; ties break to the smallest label") {
    val s2 = spark
    import s2.implicits._
    // path 0-1-2-3-4-5 seeded at node 0: depth-5 frontier. Node 10 sits
    // between seeds 11 (label 9) and 12 (label 3) — one vote each, so the
    // tie must break to label 3.
    val seeds = Seq((0L, 7L), (11L, 9L), (12L, 3L)).toDF("node", "lbl")
    val chain = (0L to 4L).map(i => (i, i + 1)) ++ Seq((11L, 10L), (12L, 10L))
    val edges = chain.toDF("src", "dst")
      .unionAll(chain.map(_.swap).toDF("src", "dst"))
    val got = spark.read.parquet(SimilarityQueries.propagateConverged(
        spark, seeds, edges, graft.Staging.fresh("lpchain")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert((1L to 5L).forall(i => got(i) == ((7L, i))),
      "each chain node adopts at its distance; round 5 is reached")
    assert(got(10L) == ((3L, 1L)), "equal-vote tie breaks to the smallest label")
  }
}
