package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q208 bucket-and-verify interval-overlap join: equality with the
  * brute-force range-predicate join (the quadratic plan the bucketing
  * replaces), and the plan-shape guarantee that makes it the scale
  * form — a hash join, never a nested loop or cartesian product.
  */
class IntervalJoinSpec extends AnyFunSuite {

  private def spans = {
    val ev = graft.Tables.events(spark, sfDir)
    ev.groupBy(col("user_id"), col("ts").cast("date").as("d"))
      .agg(min("ts").as("a0"), max("ts").as("a1"))
  }

  private def incidents = {
    val ev = graft.Tables.events(spark, sfDir)
    TemporalQueries.incidentHours(
      ev.groupBy(date_trunc("HOUR", col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt")))
  }

  test("q208 bucketed overlap == brute-force range-predicate join") {
    val bucketed = TemporalQueries.bucketedOverlap(spans, incidents)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3))).toSet
    // the quadratic baseline: every span against every incident hour,
    // range predicate only — no bucketing anywhere
    val brute = spans.crossJoin(incidents)
      .filter(col("a0") < col("h") + expr("interval 1 hour") && col("h") <= col("a1"))
      .groupBy("user_id", "d")
      .agg(count(lit(1)).cast("bigint").as("n_inc_hours"),
        sum(least(unix_micros(col("a1")), unix_micros(col("h")) + lit(3600000000L))
          - greatest(unix_micros(col("a0")), unix_micros(col("h"))))
          .cast("bigint").as("overlap_us"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3))).toSet
    assert(bucketed.nonEmpty, "fixture must produce incident overlaps")
    assert(bucketed === brute)
  }

  test("q208 plan is a hash join — no nested loop, no cartesian product") {
    val plan = TemporalQueries.q208IntervalOverlap(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "bucketed interval join must not plan a nested loop")
    assert(!plan.contains("CartesianProduct"),
      "bucketed interval join must not plan a cartesian product")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash/merge join on the bucket key in:\n$plan")
  }

  test("q208 overlap microseconds are bounded by span length and incident hours") {
    val out = TemporalQueries.q208IntervalOverlap(spark, sfDir).collect()
    val spanLen = spans.select(col("user_id"), col("d"),
        (unix_micros(col("a1")) - unix_micros(col("a0"))).as("len"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    out.foreach { r =>
      val key = (r.getLong(0), r.getDate(1).toString)
      val (nh, ov) = (r.getLong(2), r.getLong(3))
      assert(ov >= 0L && ov <= spanLen(key),
        s"overlap must sit inside the span: $key ov=$ov len=${spanLen(key)}")
      assert(ov <= nh * 3600000000L,
        s"overlap cannot exceed the joined incident hours: $key")
    }
  }
}
