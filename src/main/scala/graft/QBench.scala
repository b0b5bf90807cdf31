package graft
object QBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- args.drop(1); i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
