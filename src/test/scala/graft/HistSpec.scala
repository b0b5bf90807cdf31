package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native fixed-bin histogram aggregate (functions/Hist.scala,
  * q248's engine): differential equivalence against the per-bin groupBy
  * form it replaces, merge-path invariance under repartitioning (the
  * property that makes per-shard histograms safe to union at 100 TB),
  * edge clamping, null skipping, and counter conservation. */
class HistSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val grouped = (0 until 5000)
    .map(i => ((i % 7).toString, (i.toLong * 2654435761L) % 64L))
    .toDF("g", "b")

  test("graft_hist equals the per-bin groupBy counts") {
    val hist = grouped.groupBy("g")
      .agg(expr("graft_hist(b, 64)").as("h"))
      .as[(String, Seq[Long])].collect().toMap
    val expected = grouped.groupBy("g", "b").count()
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (g, rows) =>
        val arr = new Array[Long](64)
        rows.foreach { case (_, b, c) => arr(b.toInt) = c }
        g -> arr.toSeq
      }
    assert(hist === expected)
    assert(hist.values.forall(_.length == 64))
  }

  test("result is invariant under partitioning (merge path)") {
    def run(parts: Int): Map[String, Seq[Long]] =
      grouped.repartition(parts).groupBy("g")
        .agg(expr("graft_hist(b, 64)").as("h"))
        .as[(String, Seq[Long])].collect().toMap
    assert(run(1) === run(32))
  }

  test("out-of-range bins clamp to the edge counters; counters conserve") {
    val edgy = Seq(("a", -5L), ("a", 0L), ("a", 63L), ("a", 99L), ("a", 7L))
      .toDF("g", "b")
    val h = edgy.groupBy("g").agg(expr("graft_hist(b, 64)").as("h"))
      .as[(String, Seq[Long])].collect().toMap.apply("a")
    assert(h(0) == 2L && h(63) == 2L && h(7) == 1L)
    assert(h.sum == 5L)
  }

  test("null inputs are skipped") {
    val withNull = Seq(("a", Some(3L)), ("a", None), ("a", Some(3L)))
      .toDF("g", "b")
    val h = withNull.groupBy("g").agg(expr("graft_hist(b, 8)").as("h"))
      .as[(String, Seq[Long])].collect().toMap.apply("a")
    assert(h(3) == 2L && h.sum == 2L)
  }

  test("q248's row-local selection equals the q184-style window selection") {
    val native = operators.SegmentationQueries
      .q248NativeHistogram(spark, SparkTestSession.sfDir).collect().toSeq
    val W = org.apache.spark.sql.expressions.Window
    val twoPhase = Tables.events(spark, SparkTestSession.sfDir)
      .select(col("event_type"),
        expr("least(511L, greatest(0L, cast(floor(value) as bigint)))").as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).cast("bigint").as("cnt"))
      .withColumn("cum", sum("cnt").over(
        W.partitionBy("event_type").orderBy("bin")
          .rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("n", sum("cnt").over(W.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max("n").cast("bigint").as("n_events"),
        min(when(expr("2 * cum >= n"), col("bin"))).cast("bigint").as("p50_bin"),
        min(when(expr("20 * cum >= 19 * n"), col("bin"))).cast("bigint").as("p95_bin"))
      .orderBy("event_type").collect().toSeq
    assert(native.nonEmpty && native.map(_.toSeq) == twoPhase.map(_.toSeq))
  }
}
