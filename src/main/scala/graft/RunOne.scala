package graft

/** Dev tool: run ONE registered query with Bench's exact warmup and
  * evaluation action and print its wall time — for iterating on a single
  * query's plan without paying a full bench sweep. Usage:
  *
  *   sbt "runMain graft.RunOne q50_cc_clusters /root/testdata/sf0.1"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val fn = SparkEntry.queries(name)
    val spark = GraftSession.getOrCreate()
    Bench.warmup(spark, sfDir)
    val t0 = System.nanoTime()
    Bench.evaluateAll(fn(spark, sfDir))
    println(f"[runone] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
