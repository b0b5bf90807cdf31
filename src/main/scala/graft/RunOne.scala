package graft

import org.apache.spark.sql.functions.{col, struct, xxhash64}
import org.apache.spark.sql.functions.expr

/** Dev tool: run ONE registered query with Bench's exact evaluation action
  * and print its wall time — for iterating on a single query's plan without
  * paying a full bench sweep. Usage:
  *
  *   sbt "runMain graft.RunOne q50_cc_clusters /root/testdata/sf0.1"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val fn = SparkEntry.queries(name)
    val spark = GraftSession.getOrCreate()
    // same warmup as Bench so the measured window is comparable
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).selectExpr("count(l_orderkey)").collect()
    Tables.events(spark, sfDir).selectExpr("count(event_id)").collect()
    Tables.documents(spark, sfDir).selectExpr("count(doc_id)").collect()
    Tables.embeddings(spark, sfDir).selectExpr("count(vec_id)").collect()
    Tables.orders(spark, sfDir).selectExpr("count(o_orderkey)").collect()
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    println(f"[runone] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
