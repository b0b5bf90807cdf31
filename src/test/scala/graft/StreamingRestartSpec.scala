package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-restart recovery — the production claim in
  * StreamingQueries' docstring ("the checkpoint directory is what carries
  * the exactly-once file-tracking and state-store lineage across
  * restarts"), exercised instead of documented. This is the Spark-native
  * form of the reference's rerun-a-failed-month semantics
  * (`/root/reference/airflow/dags/spark_transform_load.py:262,314-315`
  * re-trigger a failed incremental load and the warehouse must come out
  * as if the failure never happened).
  *
  * Shape of both tests: the events fixture is split at a DAY boundary
  * into an "already arrived" and a "still to arrive" half. Run 1
  * processes the first half with `Trigger.AvailableNow` against a durable
  * checkpoint and stops — a scheduled incremental load that ran and
  * exited. The second half is then dropped into the source directory and
  * the SAME topology restarts from the SAME checkpoint. Recovery must
  * prove two things at once:
  *
  *   - file-tracking exactly-once: the restarted run reads ONLY the new
  *     files (asserted via `numInputRows` — a re-scan of run 1's files
  *     would double-count the windows still open across the cutoff);
  *   - state-store lineage: hour windows STRADDLING the restart finalize
  *     with contributions from both runs — counts that can only be right
  *     if run 2 resumed run 1's aggregation state rather than starting
  *     empty.
  *
  * The first test runs q36's exact topology (watermark → hourly window →
  * append) into a file sink; the second runs the StreamingSinkSpec
  * production sink (`foreachBatch` + dynamic-partition upsert) through
  * the same stop/restart, where the day-boundary split is also what the
  * upsert's partition-completeness precondition requires of a real
  * ingest cadence. */
class StreamingRestartSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val raw = spark.read.parquet(s"$sfDir/events.parquet")
  private lazy val rawSchema = raw.schema

  /** Raw ts as epoch nanoseconds, across both fixture encodings (see
    * Tables.restoreEventTs): nanos-as-long passes through; the NTZ micros
    * encoding reinterprets under the session's UTC zone, like the readers. */
  private lazy val tsNanos: Column =
    if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType) col("ts")
    else unix_micros(col("ts").cast("timestamp")) * lit(1000L)

  /** Restart cutoff: the day boundary nearest the middle of the event
    * range, in epoch nanos. */
  private val dayNanos = 86400L * 1000000000L
  private lazy val cutoff: Long = {
    val r = raw.agg(min(tsNanos), max(tsNanos)).head()
    ((r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2) / dayNanos) * dayNanos
  }

  /** Write the rows matching `pred` as plain parquet files into the
    * streaming source dir (simulating an arrival); returns the row
    * count. */
  private def deliver(inDir: String, pred: Column, tag: String): Long = {
    val tmp = Staging.fresh(s"rs_half_$tag")
    val half = raw.filter(pred)
    half.write.mode("overwrite").parquet(s"$tmp/h")
    // listFiles() is null (not empty) when the dir is missing — surface a
    // useful assertion instead of an opaque NPE if the staging write failed
    Option(new java.io.File(s"$tmp/h").listFiles())
      .getOrElse(fail(s"staging write produced no directory at $tmp/h"))
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
      .zipWithIndex.foreach { case (f, i) =>
        Files.copy(f.toPath, Paths.get(s"$inDir/${tag}_$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    half.count()
  }

  private def sourceStream(inDir: String): DataFrame =
    Tables.restoreEventTs(
      spark.readStream.schema(rawSchema).parquet(s"$inDir/*.parquet"))

  test("q36's hourly windows survive a stop + same-checkpoint restart with no loss or duplication") {
    val inDir = Staging.fresh("rs_in")
    val ckpt = Staging.fresh("rs_ck")
    val outDir = Staging.fresh("rs_out") + "/out"

    def runOnce(): Long = {
      val q = sourceStream(inDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"), col("cnt"))
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }

    val nA = deliver(inDir, tsNanos < cutoff, "a")
    assert(runOnce() === nA)
    val afterFirst = spark.read.parquet(outDir).count()

    val nB = deliver(inDir, tsNanos >= cutoff, "b")
    assert(runOnce() === nB,
      "the restarted run must read ONLY the new files (exactly-once file tracking)")

    // the recovered stream must equal the batch finalized-window aggregate
    // (q36's oracle contract: window_end <= max(ts) - 1h)
    val ev = Tables.events(spark, sfDir)
    val mxEpoch = ev.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val expected = ev
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .filter(unix_timestamp(col("window.end")) <= mxEpoch - 3600)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val got = spark.read.parquet(outDir).select("h", "cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === expected.toSeq)
    assert(afterFirst > 0 && afterFirst < expected.length,
      s"run 1 must emit SOME but not all windows ($afterFirst of ${expected.length}) " +
        "or the restart proves nothing")
  }

  test("the stream-static enrichment join survives a stop + restart (q191 topology)") {
    val inDir = Staging.fresh("rse_in")
    val ckpt = Staging.fresh("rse_ck")
    val outDir = Staging.fresh("rse_out") + "/out"
    val dim = broadcast(Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment")))

    def runOnce(): Long = {
      val q = sourceStream(inDir)
        .withWatermark("ts", "1 hour")
        .join(dim, Seq("user_id"))
        .groupBy(col("segment"), window(col("ts"), "1 hour"))
        .agg(count(lit(1)).cast("bigint").as("n_events"))
        .select(col("segment"),
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("n_events"))
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }

    val nA = deliver(inDir, tsNanos < cutoff, "a")
    assert(runOnce() === nA)
    val nB = deliver(inDir, tsNanos >= cutoff, "b")
    assert(runOnce() === nB,
      "the restarted run must read ONLY the new files — the static dim " +
        "side must not disturb exactly-once source tracking")

    // recovered stream == batch join with the finalization cut; windows
    // straddling the restart need state from BOTH runs to count right
    val ev = Tables.events(spark, sfDir)
    val mxEpoch = ev.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val expected = ev.join(dim, Seq("user_id"))
      .groupBy(col("segment"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).cast("bigint").as("n_events"))
      .filter(unix_timestamp(col("window.end")) <= mxEpoch - 3600)
      .select(col("segment"),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
        col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val got = spark.read.parquet(outDir).select("segment", "h", "n_events")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === expected.toSeq)
  }

  test("the foreachBatch upsert lake resumes from the same checkpoint without loss or duplication") {
    val inDir = Staging.fresh("rsf_in")
    val ckpt = Staging.fresh("rsf_ck")
    val lake = Staging.fresh("rsf_lake") + "/events_lake"

    def runOnce(): Unit = {
      val q = sourceStream(inDir)
        .withColumn("day", expr("cast(cast(ts as date) as string)"))
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.etl.Warehouse.upsertPartitions(batch, "day", lake)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val nA = deliver(inDir, tsNanos < cutoff, "a")
    runOnce()
    assert(spark.read.parquet(lake).count() === nA)

    val nB = deliver(inDir, tsNanos >= cutoff, "b")
    runOnce()
    val total = Tables.events(spark, sfDir).count()
    assert(nA + nB === total, "the two halves must partition the fixture")
    assert(spark.read.parquet(lake).count() === total)
    assert(spark.read.parquet(lake).select("event_id").distinct().count() === total,
      "no event may land twice across the restart")
  }
}
