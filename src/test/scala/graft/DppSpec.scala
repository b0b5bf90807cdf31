package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Evidence that Catalyst's DYNAMIC PARTITION PRUNING fires against
  * this library's partitioned warehouse layout: a join between the
  * month-partitioned fact table and a selectively-filtered dimension
  * plants a DynamicPruningExpression on the fact scan, so the fact
  * table reads only the partitions the dim rows can match — the
  * automatic counterpart of the reference's hand-built min/max dynamic
  * filter (q19 / TransformJourneys), and the 100 TB difference between
  * scanning a month and scanning the lake. The result is also checked
  * against the same join computed without the partitioned layout. */
class DppSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("a selective dim join dynamically prunes fact partitions") {
    val root = Staging.fresh("dpp")
    // at fixture scale the stats-based benefit estimate rounds to zero;
    // production partitions are GBs where the default heuristic fires
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
    // month-partitioned fact over the events fixture
    val ev = Tables.events(spark, sfDir)
      .withColumn("d", col("ts").cast("date"))
    ev.write.mode("overwrite").partitionBy("d").parquet(s"$root/fact")
    val fact = spark.read.parquet(s"$root/fact")
    // a dim carrying one row per day, filtered to a few days — keyed by
    // the SAME (string) type as the read-back partition column: a cast
    // on the partition attribute would make the scan DPP-ineligible
    // the selective predicate must survive as a literal comparison:
    // a bare boolean attribute is simplified out of EqualTo form and
    // fails DPP's isLikelySelective test
    val dim = fact.select(col("d")).distinct()
      .withColumn("flag",
        (dayofmonth(col("d").cast("date")) % 10).cast("int"))
    dim.write.mode("overwrite").parquet(s"$root/dim")
    val dimR = spark.read.parquet(s"$root/dim").filter(col("flag") === 3)
    val joined = fact.join(dimR, Seq("d")).groupBy("d")
      .agg(count(lit(1)).as("cnt"))
    // partition-column type inference is off (the reference's conf,
    // GraftSession) — the read-back partition col is a string
    val rows = joined.collect().map(r => (r.get(0).toString, r.getLong(1)))
    // the executed plan carries a dynamic pruning subquery on the scan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a DynamicPruningExpression in:\n${plan.take(4000)}")
    // and the result equals the layout-free computation
    val expected = ev.join(dimR, Seq("d")).groupBy("d")
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
    assert(rows.toSet == expected.toSet && rows.nonEmpty)
  }
}
