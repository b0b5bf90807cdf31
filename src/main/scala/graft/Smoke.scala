package graft

/** Mirrors the driver's t1 smoke: SparkEntry.entry on sf0.001, rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val n = SparkEntry.entry(spark).count()
    println(s"""{"smoke_rows":$n,"ok":${n > 0}}""")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
