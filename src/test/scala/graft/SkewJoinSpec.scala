package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Evidence for SCALE.md's skew claim: AQE's OptimizeSkewedJoin really
  * does split a hot key's partition at runtime in this session
  * configuration (it is the mitigation the library leans on for
  * candidate-join skew — LSH hot buckets, SemDeDup hot clusters, the
  * q134 profile's output). The test constructs a join where one key
  * holds ~40% of the left side, forces the shuffle path (no broadcast),
  * lowers the skew thresholds to fixture scale, and asserts both the
  * runtime skew split (skew=true in the final adaptive plan) AND that
  * the split preserves the exact join result. */
class SkewJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("AQE splits the hot key's partition and preserves the join result") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val left = spark.range(0, 200000)
        .select(when(col("id") % 5 < 2, 0L).otherwise(col("id") % 1000).as("k"),
          col("id").as("payload"))
      val right = spark.range(0, 1000)
        .select(col("id").as("k"), (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's own query execution (a count() would
      // build a different one and leave this adaptive plan unfinalized)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a runtime skew-split join in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
