package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev tool: drive a streaming topology directly and print the
  * per-micro-batch durationMs breakdown (triggerExecution, queryPlanning,
  * walCommit, stateStoreCommit, ...) NEXT TO its batch twin's wall time —
  * for attributing the AvailableNow streaming premium per topology.
  * Topologies: q124 (windowed agg), q63 (minhash-band dedup), q72
  * (stream-stream interval join), q227 (24-way fanout + chained
  * dedup/agg state stores). Usage:
  *
  *   sbt "runMain graft.StreamProfile /root/testdata/sf0.1 [q124|q63|q72|q227] [trials] [parts]"
  */
object StreamProfile {

  /** The batch twins per topology, decomposed so the expensive subtree
    * (banding, the join) is timed separately from the full twin. */
  private def batchTwins(topo: String, bs: SparkSession,
                         sfDir: String): Seq[(String, () => Long)] = topo match {
    case "q124" => Seq(
      "scan-count" -> (() =>
        Tables.events(bs, sfDir).selectExpr("count(event_id)")
          .collect()(0).getLong(0)),
      "type-agg" -> (() =>
        Tables.events(bs, sfDir).groupBy("event_type")
          .agg(count(lit(1))).collect().length.toLong),
      "window-agg" -> (() =>
        Tables.events(bs, sfDir)
          .withColumn("w", window(col("ts"), "6 hours", "3 hours"))
          .groupBy(col("w"), col("event_type"))
          .agg(count(lit(1)).cast("bigint").as("cnt"))
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
            col("event_type"), col("cnt"))
          .orderBy("w", "event_type").collect().length.toLong))
    case "q63" =>
      def banded(): DataFrame = {
        def once(): DataFrame = {
          val docs = Tables.documents(bs, sfDir)
          docs.select(col("doc_id"), col("text"))
            .unionByName(Tables.documents(bs, sfDir)
              .filter(col("doc_id") % 10 === 0)
              .select(col("doc_id"), concat(col("text"), lit(" dup")).as("text")))
        }
        once().unionByName(once())
          .withColumn("toks", expr("split(text, ' ')"))
          .filter(expr("size(toks) >= 3"))
          .withColumn("hs", expr(graft.operators.DedupQueries.bandShinglesExpr))
          .withColumn("bkey", concat(
            expr(graft.operators.DedupQueries.minhashSlotExpr(0)),
            expr(graft.operators.DedupQueries.minhashSlotExpr(1))))
      }
      Seq(
        "banding-distinct" -> (() =>
          banded().select("bkey").distinct().count()),
        "full-twin" -> (() =>
          banded()
            .withColumn("ts", expr(
              "timestampadd(MINUTE, cast(conv(substring(md5(bkey), 1, 4), 16, 10) as int) % 2880, " +
                "timestamp'2024-01-01 00:00:00')"))
            .dropDuplicates("bkey")
            .groupBy(window(col("ts"), "1 hour"))
            .agg(count(lit(1)).cast("bigint").as("cnt"))
            .collect().length.toLong))
    case "q227" =>
      def pairs(): DataFrame = Tables.events(bs, sfDir)
        .select(col("user_id"), date_trunc("HOUR", col("ts")).as("eh"))
        .select(col("user_id"), col("eh"), explode(expr("sequence(0, 23)")).as("off"))
        .select(col("user_id"), expr("timestampadd(HOUR, off, eh)").as("wh"))
      Seq(
        "explode-count" -> (() =>
          pairs().selectExpr("count(*)").collect()(0).getLong(0)),
        "distinct-pairs" -> (() =>
          pairs().dropDuplicates("user_id", "wh").count()),
        "full-twin" -> (() =>
          pairs().dropDuplicates("user_id", "wh")
            .groupBy(window(col("wh"), "1 hour"))
            .agg(count(lit(1)).cast("bigint").as("cnt"))
            .collect().length.toLong))
    case "q72" => Seq(
      "interval-join" -> { () =>
        val ev = Tables.events(bs, sfDir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
            col("ts").as("pts"))
        clicks.join(purchases,
            col("user_id") === col("p_user") &&
              col("pts") >= col("cts") &&
              col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
          .selectExpr("count(*)").collect()(0).getLong(0)
      })
    case other => sys.error(s"unknown topology $other")
  }

  private def streamFrame(topo: String, ss: SparkSession,
                          sfDir: String): DataFrame = topo match {
    case "q124" => graft.streaming.StreamSources.events(ss, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("event_type"), col("cnt"))
    case "q63" => graft.streaming.StreamingQueries.neardupStreamFrame(ss, sfDir)
    case "q72" => graft.streaming.StreamingQueries.intervalJoinStreamFrame(ss, sfDir)
    case "q227" => graft.streaming.StreamingQueries.slidingDistinctStreamFrame(ss, sfDir)
    case other => sys.error(s"unknown topology $other")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val topo = args.lift(1).getOrElse("q124")
    val trials = args.lift(2).map(_.toInt).getOrElse(3)
    val parts = args.lift(3).getOrElse("4")
    val ckptRoot = args.lift(4) // e.g. /dev/shm/graft-ckpt
    val spark = GraftSession.getOrCreate()
    Bench.warmup(spark, sfDir)
    // batch-compute bound: the same work, no streaming machinery
    for (t <- 1 to trials) {
      val bs = spark.newSession()
      bs.conf.set("spark.sql.shuffle.partitions", parts)
      batchTwins(topo, bs, sfDir).foreach { case (tag, body) =>
        val b0 = System.nanoTime()
        val n = body()
        println(f"[sprof] batch $topo $tag trial $t: rows=$n " +
          f"${(System.nanoTime() - b0) / 1e9}%.3f s")
      }
    }
    for (t <- 1 to trials) {
      val t0 = System.nanoTime()
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", parts)
      ckptRoot.foreach(r => ss.conf.set("spark.sql.streaming.checkpointLocation",
        s"$r/${java.util.UUID.randomUUID()}"))
      args.lift(5).foreach(b => ss.conf.set("spark.sql.files.maxPartitionBytes", b))
      val t1 = System.nanoTime()
      val w = streamFrame(topo, ss, sfDir)
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
      println(s"[sprof] $topo trial $t: session=${ms(t0, t1)}ms build=${ms(t1, t2)}ms " +
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
