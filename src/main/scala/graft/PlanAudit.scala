package graft

/** Dev diagnostic: print the executed plan of one or more registered
  * queries (default: a pushdown/pruning/broadcast-sensitive sample).
  * Usage: runMain graft.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_agg", "q30_partitioned_write", "q25_cosine_topk", "q02_topk_join")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
