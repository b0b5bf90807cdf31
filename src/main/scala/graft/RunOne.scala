package graft

/** Dev tool: run ONE registered query with Bench's exact warmup and
  * evaluation action and print its wall time per trial — for iterating on
  * a single query's plan without paying a full bench sweep. Trial 1
  * includes the query's one-time plan-optimization + codegen cost; later
  * trials show the steady state the bench median reports. Usage:
  *
  *   sbt "runMain graft.RunOne q50_cc_clusters /root/testdata/sf0.1 [trials]"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    // comma-separated names run several queries in one warmed JVM — the
    // optimization round's group-measurement loop without a full sweep
    val (names, sfDir) = (args(0).split(',').toSeq, args(1))
    val trials = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = GraftSession.getOrCreate()
    Bench.warmup(spark, sfDir)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to trials).map { t =>
        val t0 = System.nanoTime()
        Bench.evaluateAll(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[runone] $name trial $t: $dt%.3f s")
        dt
      }
      println(f"[runone] $name median: ${Bench.median(ts)}%.3f s")
    }
    spark.stop()
  }
}
