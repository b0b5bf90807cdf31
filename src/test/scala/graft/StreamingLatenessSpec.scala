package graft

import java.nio.file.{Files, StandardCopyOption}
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState, Trigger}
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{SessEvent, SessState, Sessionize}

/** Event-time lateness and state semantics the bounded q36/q39 fixture runs
  * never reach: a two-batch file stream where a post-watermark row must be
  * dropped and an open window withheld, plus the sessionizer's timeout and
  * cross-batch-merge branches, driven directly through TestGroupState.
  */
class StreamingLatenessSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def us(iso: String): Long = Instant.parse(iso).toEpochMilli * 1000L

  private def tsOf(iso: String): Timestamp = Timestamp.from(Instant.parse(iso))

  /** Write `times` as one parquet file named `name` in `dir` with the given
    * mtime (FileStreamSource orders batches by modification time). */
  private def writeOne(dir: java.io.File, name: String, mtime: Long,
                       times: Seq[String]): Unit = {
    import spark.implicits._
    val stage = new java.io.File(graft.Staging.fresh("late_stage"))
    times.toDF("s").select(to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
    val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new java.io.File(dir, name)
    Files.move(part.toPath, dest.toPath, StandardCopyOption.REPLACE_EXISTING)
    dest.setLastModified(mtime)
    stage.listFiles().foreach(_.delete()); stage.delete()
  }

  test("multi-batch stream drops a post-watermark row and withholds open windows") {
    val dir = new java.io.File(graft.Staging.fresh("late"))
    val now = System.currentTimeMillis()
    // Three files → three micro-batches (maxFilesPerTrigger=1, ordered by
    // mtime). Three, not two, because late-event filtering uses the
    // PREVIOUS batch's watermark while state eviction uses the current one
    // (SPARK-40925): the watermark established by file A only starts
    // dropping late input from file C onwards.
    writeOne(dir, "a.parquet", now - 180000,
      Seq("2024-01-01 10:10:00", "2024-01-01 10:20:00", "2024-01-01 12:30:00"))
    writeOne(dir, "b.parquet", now - 120000,
      Seq("2024-01-01 13:00:00"))
    writeOne(dir, "c.parquet", now - 60000,
      Seq("2024-01-01 10:40:00", "2024-01-01 14:10:00"))
    val schema = StructType(Seq(StructField("ts", TimestampType)))
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format(col("window.start"), "HH:mm").as("h"), col("cnt"))
      .writeStream.format("memory").queryName("graft_lateness_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("graft_lateness_test").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // batch A (10:10, 10:20, 12:30) establishes watermark 11:30; batch B
    // (13:00) runs with it — [10:00) cnt=2 finalizes and is emitted — and
    // raises it to 12:00; batch C's 10:40 row is below the late-event
    // watermark (11:30) and is DROPPED (were it kept, it would re-open the
    // already-emitted [10:00) window and append a duplicate row), while
    // 14:10 raises the watermark to 13:10, finalizing [12:00) cnt=1 in the
    // closing no-data batch. [13:00) and [14:00) stay open in state,
    // unemitted.
    assert(out === Map("10:00" -> 2L, "12:00" -> 1L))
  }

  test("sessionize timeout branch flushes the open session and clears state") {
    val st = SessState(3, us("1970-01-01T00:00:01Z"), us("1970-01-01T00:00:02Z"), 5)
    val gs = TestGroupState.create[SessState](
      Optional.of(st), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], true)
    val out = Sessionize.processGroup(42L, Iterator.empty, gs).toList
    assert(out.map(s => (s.user_id, s.session_idx, s.session_start, s.session_end, s.n_events))
      === List((42L, 3, "1970-01-01 00:00:01", "1970-01-01 00:00:02", 5L)))
    assert(gs.isRemoved, "timed-out state must be removed")
  }

  test("cross-batch late event inside the gap extends the session backwards") {
    val st = SessState(1, us("2024-01-01T10:00:00Z"), us("2024-01-01T10:30:00Z"), 3)
    val gs = TestGroupState.create[SessState](
      Optional.of(st), GroupStateTimeout.NoTimeout, 1000L, Optional.empty[Long], false)
    val late = SessEvent(7L, 99L, tsOf("2024-01-01T09:45:00Z"))
    val out = Sessionize.processGroup(7L, Iterator(late), gs).toList
    assert(out.isEmpty, "in-gap event must not close the session")
    assert(gs.isUpdated)
    val updated = gs.get
    assert(updated.startUs === us("2024-01-01T09:45:00Z"),
      "session_start must extend backwards to the late event")
    assert(updated.lastUs === us("2024-01-01T10:30:00Z"))
    assert(updated.nEvents === 4L)
  }

  test("in-batch stray plus bridging event merge into one island with the open session") {
    val st = SessState(2, us("2024-01-01T10:00:00Z"), us("2024-01-01T10:30:00Z"), 3)
    val gs = TestGroupState.create[SessState](
      Optional.of(st), GroupStateTimeout.NoTimeout, 1000L, Optional.empty[Long], false)
    // 09:15 is beyond the gap from 10:00 on its own, but 09:40 bridges
    // (25 min to 09:15, 20 min to 10:00): the batch twin chains all five
    // events into ONE island, so nothing may close
    val evs = Iterator(SessEvent(7L, 97L, tsOf("2024-01-01T09:15:00Z")),
                       SessEvent(7L, 96L, tsOf("2024-01-01T09:40:00Z")))
    val out = Sessionize.processGroup(7L, evs, gs).toList
    assert(out.isEmpty, "bridged island must not close anything")
    val u = gs.get
    assert(u.sessionIdx === 2)
    assert(u.startUs === us("2024-01-01T09:15:00Z"))
    assert(u.lastUs === us("2024-01-01T10:30:00Z"))
    assert(u.nEvents === 5L)
  }

  test("two early islands: the non-bridging one closes, the bridging one merges") {
    val st = SessState(1, us("2024-01-01T10:00:00Z"), us("2024-01-01T10:30:00Z"), 3)
    val gs = TestGroupState.create[SessState](
      Optional.of(st), GroupStateTimeout.NoTimeout, 1000L, Optional.empty[Long], false)
    // 08:00 stands alone (105 min to 09:45); 09:45 bridges to 10:00
    val evs = Iterator(SessEvent(7L, 95L, tsOf("2024-01-01T08:00:00Z")),
                       SessEvent(7L, 94L, tsOf("2024-01-01T09:45:00Z")))
    val out = Sessionize.processGroup(7L, evs, gs).toList
    assert(out.map(s => (s.session_idx, s.session_start, s.session_end, s.n_events))
      === List((1, "2024-01-01 08:00:00", "2024-01-01 08:00:00", 1L)))
    val u = gs.get
    assert(u.sessionIdx === 2, "open session renumbers after the closed island")
    assert(u.startUs === us("2024-01-01T09:45:00Z"))
    assert(u.nEvents === 4L)
  }

  test("cross-batch late event beyond the gap becomes its own earlier session") {
    val st = SessState(2, us("2024-01-01T10:00:00Z"), us("2024-01-01T10:30:00Z"), 3)
    val gs = TestGroupState.create[SessState](
      Optional.of(st), GroupStateTimeout.NoTimeout, 1000L, Optional.empty[Long], false)
    // 08:00 is 2 h before session start (> 30 min gap): the batch twin
    // puts it in its own island, so it must NOT merge into [10:00, 10:30]
    val stray = SessEvent(7L, 98L, tsOf("2024-01-01T08:00:00Z"))
    val out = Sessionize.processGroup(7L, Iterator(stray), gs).toList
    assert(out.map(s => (s.session_idx, s.session_start, s.session_end, s.n_events))
      === List((2, "2024-01-01 08:00:00", "2024-01-01 08:00:00", 1L)),
      "stray must close as a singleton taking the pre-renumber index")
    val updated = gs.get
    assert(updated.sessionIdx === 3, "open session renumbers after the stray")
    assert(updated.startUs === us("2024-01-01T10:00:00Z"),
      "open session boundaries must NOT absorb the stray")
    assert(updated.lastUs === us("2024-01-01T10:30:00Z"))
    assert(updated.nEvents === 3L)
  }
}
