package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev tool: drive the q124 topology directly and print the
  * per-micro-batch durationMs breakdown (triggerExecution, queryPlanning,
  * walCommit, stateStoreCommit, ...) — for attributing the AvailableNow
  * fixed overhead. Usage:
  *
  *   sbt "runMain graft.StreamProfile /root/testdata/sf0.1 [trials]"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val trials = args.lift(1).map(_.toInt).getOrElse(3)
    val parts = args.lift(2).getOrElse("4")
    val ckptRoot = args.lift(3) // e.g. /dev/shm/graft-ckpt
    val spark = GraftSession.getOrCreate()
    Bench.warmup(spark, sfDir)
    // batch-compute bound: the same scan + window agg, no streaming —
    // decomposed into scan-only, plain agg, and the full window agg
    for (t <- 1 to trials) {
      val bs = spark.newSession()
      bs.conf.set("spark.sql.shuffle.partitions", args.lift(2).getOrElse("4"))
      def time(tag: String)(body: => Long): Unit = {
        val b0 = System.nanoTime()
        val n = body
        println(f"[sprof] batch $tag trial $t: rows=$n " +
          f"${(System.nanoTime() - b0) / 1e9}%.3f s")
      }
      time("scan-count") {
        graft.Tables.events(bs, sfDir).selectExpr("count(event_id)")
          .collect()(0).getLong(0)
      }
      time("type-agg") {
        graft.Tables.events(bs, sfDir).groupBy("event_type")
          .agg(count(lit(1))).collect().length.toLong
      }
      time("window-agg") {
        graft.Tables.events(bs, sfDir)
          .withColumn("w", window(col("ts"), "6 hours", "3 hours"))
          .groupBy(col("w"), col("event_type"))
          .agg(count(lit(1)).cast("bigint").as("cnt"))
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
            col("event_type"), col("cnt"))
          .orderBy("w", "event_type").collect().length.toLong
      }
    }
    for (t <- 1 to trials) {
      val t0 = System.nanoTime()
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", parts)
      ckptRoot.foreach(r => ss.conf.set("spark.sql.streaming.checkpointLocation",
        s"$r/${java.util.UUID.randomUUID()}"))
      args.lift(4).foreach(b => ss.conf.set("spark.sql.files.maxPartitionBytes", b))
      val t1 = System.nanoTime()
      val w = graft.streaming.StreamSources.events(ss, sfDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
          col("event_type"), col("cnt"))
        .writeStream.format("memory").queryName(s"sprof_$t")
        .outputMode("append").trigger(Trigger.AvailableNow())
      val t2 = System.nanoTime()
      val q = w.start()
      val t3 = System.nanoTime()
      q.awaitTermination()
      val t4 = System.nanoTime()
      val n = ss.table(s"sprof_$t").count()
      val t5 = System.nanoTime()
      def ms(a: Long, b: Long): Long = (b - a) / 1000000
      println(s"[sprof] trial $t: session=${ms(t0, t1)}ms build=${ms(t1, t2)}ms " +
        s"start=${ms(t2, t3)}ms drain=${ms(t3, t4)}ms read($n)=${ms(t4, t5)}ms " +
        s"total=${ms(t0, t5)}ms")
      q.recentProgress.foreach { p =>
        println(s"[sprof]   batch ${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${p.stateOperators.map(so =>
            s"commit:${so.commitTimeMs}ms rows:${so.numRowsTotal} " +
              s"custom:${so.customMetrics}").mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
