package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q158's unrolled peel is the true k-core: the 6-pass result is a
  * fixpoint (nothing left to peel) and equals a driver-side peel run to
  * convergence. */
class KcoreSpec extends AnyFunSuite {

  private def bruteKcore(k: Int): Map[Long, Long] = {
    val s2 = spark
    import s2.implicits._
    val op = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 15000)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    var edges = op.as("a").join(op.as("b"), $"a.o" === $"b.o" && $"a.p" < $"b.p")
      .select($"a.p", $"b.p").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != edges.size
      edges = next
    }
    edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
  }

  test("q158 6-pass unroll == peel-to-convergence, and is a fixpoint") {
    val got = AnalyticsQueries.q158Kcore(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteKcore(4) && got.nonEmpty)
    // fixpoint: every surviving degree >= k, so a 7th pass peels nothing
    assert(got.values.forall(_ >= 4))
  }

  test("q268 converged loop == q158 unroll on the fixture (depth 6 suffices)") {
    val unroll = AnalyticsQueries.q158Kcore(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = AnalyticsQueries.q268KcoreConverged(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loop == unroll && loop.nonEmpty)
  }

  /** Stage an explicit canonical edge list and run `passes` of the q158
    * unroll rule over it (the spec-local replica of the fixed unroll, so
    * the non-finishing case can be demonstrated on a constructed graph). */
  private def unrollOn(edges: Seq[(Long, Long)], k: Int,
                       passes: Int): Map[Long, Long] = {
    val s2 = spark
    import s2.implicits._
    val stage = graft.Staging.fresh("kcorespec")
    edges.toDF("pa", "pb").write.mode("overwrite").parquet(s"$stage/e0")
    for (r <- 1 to passes) {
      val e = spark.read.parquet(s"$stage/e${r - 1}")
      val deg = e.select(col("pa").as("node"))
        .unionAll(e.select(col("pb").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("node")
      e.join(keep.withColumnRenamed("node", "pa"), Seq("pa"), "left_semi")
        .join(keep.withColumnRenamed("node", "pb"), Seq("pb"), "left_semi")
        .select("pa", "pb")
        .write.mode("overwrite").parquet(s"$stage/e$r")
    }
    degrees(spark.read.parquet(s"$stage/e$passes")
      .collect().map(r => (r.getLong(0), r.getLong(1))))
  }

  private def degrees(edges: Seq[(Long, Long)]): Map[Long, Long] =
    edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }

  test("kcoreConverged finishes a deeper-degeneracy graph the 6-pass unroll does not") {
    val s2 = spark
    import s2.implicits._
    // Triangle 2-core with a 16-node chain grafted on: at k = 2 every
    // interior chain node (degree 2) survives until its outer neighbor
    // peels, so each pass removes exactly the one degree-1 leaf —
    // reaching the fixpoint needs 16 passes, deeper than the unroll.
    val triangle = Seq((0L, 1L), (0L, 2L), (1L, 2L))
    val chain = (0L, 100L) +: (0 until 15).map(i => (100L + i, 101L + i))
    val edges = triangle ++ chain
    val after6 = unrollOn(edges, 2, 6)
    // the unroll STOPS SHORT: chain remnants survive pass 6
    assert(after6.keys.exists(_ >= 100L))
    val stage = graft.Staging.fresh("kcorespec-conv")
    edges.toDF("pa", "pb").write.mode("overwrite").parquet(s"$stage/e0")
    val core = degrees(AnalyticsQueries
      .kcoreConverged(spark, s"$stage/e0", 2, stage)
      .collect().map(r => (r.getLong(0), r.getLong(1))))
    // the converged loop peels the whole chain and keeps exactly the triangle
    assert(core == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("kcoreConverged stabilizes at empty when the whole graph peels away") {
    val s2 = spark
    import s2.implicits._
    val stage = graft.Staging.fresh("kcorespec-empty")
    // a triangle has no 4-core
    Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("pa", "pb")
      .write.mode("overwrite").parquet(s"$stage/e0")
    assert(AnalyticsQueries.kcoreConverged(spark, s"$stage/e0", 4, stage)
      .count() == 0L)
  }
}
