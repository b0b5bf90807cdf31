package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Zorder

/** The Z-order layout's pruning contract (q109's engine): the Morton
  * cell id is bijective with the bucket pair, a rectangle rewrites to
  * exactly |ubs| x |dbs| cells, and the EXECUTED scan reads only those
  * cells' files — partition pruning observed through the scan node's
  * selected-partition count, not inferred from the logical plan. */
class ZorderSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("the Morton cell id is a bijection over the grid") {
    val all = Zorder.rectangleCells(0 until Zorder.side, 0 until Zorder.side)
    assert(all.sorted === (0 until Zorder.side * Zorder.side))
  }

  /** Descend into materialized AQE query stages (their subplans are not
    * `children` — the PlanShapeSpec traversal). */
  private def executedNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: executedNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: executedNodes(q.plan)
    case _ => p +: p.children.flatMap(executedNodes)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect()
    val nodes = executedNodes(df.queryExecution.executedPlan)
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, s"no file scan in:\n${df.queryExecution.executedPlan}")
    scans.head
  }

  test("a 2x2 bucket rectangle reads exactly its 4 cells") {
    val pruned = scanOf(Zorder.readRectangle(spark, sfDir, Seq(2, 3), Seq(4, 5))
      .groupBy("event_type").agg(count(lit(1)).as("n")))
    val full = scanOf(spark.read.parquet(Zorder.layoutFor(spark, sfDir))
      .groupBy("event_type").agg(count(lit(1)).as("n")))
    assert(pruned.partitionFilters.nonEmpty,
      "the cell rewrite must land in partitionFilters")
    val prunedParts = pruned.metrics("numPartitions").value
    val fullParts = full.metrics("numPartitions").value
    assert(prunedParts === 4L,
      s"rectangle must touch exactly 4 of $fullParts cells")
    assert(fullParts > prunedParts, "the full layout must be wider")
    assert(pruned.metrics("numFiles").value < full.metrics("numFiles").value,
      "pruning must skip files, not just directories")
  }

  test("the pruned rectangle equals the direct predicate on the source") {
    val viaLayout = Zorder.readRectangle(spark, sfDir, Seq(2, 3), Seq(4, 5))
      .agg(count(lit(1))).head().getLong(0)
    val direct = Tables.events(spark, sfDir)
      .filter(expr("user_id % 8 in (2, 3) and (dayofmonth(ts) - 1) div 4 in (4, 5)"))
      .count()
    assert(viaLayout === direct)
  }
}
