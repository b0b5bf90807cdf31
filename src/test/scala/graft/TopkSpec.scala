package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native bounded-state top-k aggregate (functions/Topk.scala):
  * bit-equality to the window row_number form, invariance under
  * repartitioning (merge order), and the map-side partial-aggregate
  * plan shape that is its whole point. */
class TopkSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def base = Tables.events(spark, sfDir)
    .select(col("event_type"),
      expr("cast(round(value * 100) as bigint)").as("vc"),
      col("event_id"))

  private def viaAgg(df: org.apache.spark.sql.DataFrame) = df
    .groupBy("event_type")
    .agg(expr("graft_topk(-vc, event_id, 5)").as("tk"))
    .select(col("event_type"), posexplode(col("tk")))
    .select(col("event_type"), (col("pos") + 1).as("rank"),
      col("col.v").as("event_id"), (-col("col.k")).as("vc"))
    .orderBy("event_type", "rank")
    .collect().toSeq

  test("graft_topk == window row_number top-k, and survives repartitioning") {
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(desc("vc"), asc("event_id"))
      base.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("event_type"), col("rank").cast("long").as("rank"),
          col("event_id"), col("vc"))
        .orderBy("event_type", "rank")
        .collect().toSeq
    }
    val agg = viaAgg(base)
    assert(agg.nonEmpty && agg == viaWindow)
    // merge-order invariance: a different partitioning must not change
    // the result (union-then-truncate is order-insensitive)
    assert(viaAgg(base.repartition(17, col("event_id"))) == agg)
    assert(viaAgg(base.repartition(3)) == agg)
  }

  test("graft_topk partial-aggregates map-side (ObjectHashAggregate x2)") {
    val plan = base.groupBy("event_type")
      .agg(expr("graft_topk(vc, event_id, 5)"))
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(aggs.size == 2,
      s"expected partial+final ObjectHashAggregate pair, got:\n$plan")
    // the exchange between them carries k pairs per group, not rows —
    // the serialized buffer is bounded: 4 + 16k bytes
    val k5 = graft.functions.Topk(
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
      org.apache.spark.sql.catalyst.expressions.Literal(5))
    val buf = k5.createAggregationBuffer()
    (1L to 1000L).foreach(i => buf.add((i, i)))
    // buffer discipline lives in insert(); direct adds are test plumbing
    assert(k5.serialize(k5.deserialize(k5.serialize(buf))).length ==
      4 + 16 * 1000)
  }

  test("graft_topk keeps exactly the k lexicographically smallest pairs") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (1L, 9L), (0L, 99L), (2L, 1L), (0L, 98L),
      (1L, 9L)).toDF("k", "v")
    val got = rows.agg(expr("graft_topk(k, v, 3)")).head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == Seq((0L, 98L), (0L, 99L), (1L, 9L)))
  }
}
