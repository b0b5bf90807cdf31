package graft

/** Benchmark main — runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A failing query is reported in "errors" (name →
  * message) and excluded from the total instead of silently timing as ~0 s
  * and improving it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    // session/codegen warmup so the alphabetically-first query doesn't
    // absorb JVM+Catalyst startup in its measured time
    spark.range(1000).selectExpr("sum(id)").collect()
    // one unmeasured parquet aggregate per fact table: first-parquet-scan
    // codegen (vectorized reader + hash-agg stages) is multi-second Janino
    // work that otherwise lands entirely inside q01's measured window
    Tables.lineitem(spark, sfDir).selectExpr("count(l_orderkey)").collect()
    Tables.events(spark, sfDir).selectExpr("count(event_id)").collect()
    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // reclaim broadcast/shuffle state from earlier queries so a full GC
      // doesn't land inside a later query's measured window
      System.gc()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          errors ::= (name -> msg)
          None
      }
    }
    val qs = JsonUtil.obj(results.map { case (k, v) => k -> v.toString })
    val errJson = JsonUtil.obj(errors.reverse.map { case (k, v) => k -> JsonUtil.quote(v) })
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_ok":${results.size},"n_err":${errors.size},"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
