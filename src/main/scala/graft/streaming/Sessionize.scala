package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.LongType

/** Input event for the sessionizer. */
case class SessEvent(user_id: Long, event_id: Long, ts: Timestamp)

/** Open-session state carried between micro-batches. */
case class SessState(sessionIdx: Int, startUs: Long, lastUs: Long, nEvents: Long)

/** Emitted session record (same shape as the batch q39_sessionize twin). */
case class SessionOut(user_id: Long, session_idx: Int, session_start: String,
                      session_end: String, n_events: Long)

/** Stateful streaming sessionization (SURVEY.md §2.10 extension):
  * `KeyValueGroupedDataset.flatMapGroupsWithState` carrying per-user
  * open-session state across micro-batches — the custom-state form of the
  * reference's schedule-based late-data handling (`spark_transform_load
  * .py:310-313` waits 10 days; state + timeouts replace the wait).
  *
  * A session closes after a 30-minute silence, matching the batch
  * gaps-and-islands twin (`RelationalQueries.q39Sessionize`) — the test
  * suite asserts both produce identical sessions. With
  * `Trigger.AvailableNow` over a bounded source every group arrives in one
  * batch, so sessions close by gap alone; in a continuous run the
  * ProcessingTimeTimeout flushes sessions whose users go quiet.
  *
  * Scale notes: state is per-user and O(1) per open session; the state
  * store shuffles once on user_id. Within a batch, events are sorted
  * per-group in memory — bounded by a user's events per trigger interval,
  * not by history (history lives in the 16-byte state row).
  */
object Sessionize {

  private val gapUs = 1800L * 1000000
  private val fmt = "yyyy-MM-dd HH:mm:ss"

  // one formatter per executor thread, not one per closed session
  // (SimpleDateFormat is mutable, hence not shareable across threads)
  private val fmtTL: ThreadLocal[java.text.SimpleDateFormat] =
    ThreadLocal.withInitial { () =>
      val f = new java.text.SimpleDateFormat(fmt)
      f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      f
    }

  private def formatUs(us: Long): String =
    fmtTL.get.format(new java.util.Date(us / 1000))

  /** Exact microseconds of a Timestamp — `getTime` alone truncates to
    * milliseconds, which would diverge from the batch twin's `unix_micros`
    * gap arithmetic on sub-millisecond boundaries. */
  private def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Per-group transition: fold this batch's events (sorted by event time)
    * into the open-session state, emitting every session that closes. */
  def processGroup(userId: Long, events: Iterator[SessEvent],
                   state: GroupState[SessState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(st =>
        SessionOut(userId, st.sessionIdx, formatUs(st.startUs), formatUs(st.lastUs), st.nEvents))
      state.remove()
      return out.iterator
    }
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var closed = List.empty[SessionOut]
    var st = state.getOption.orNull

    // Cross-batch lateness: events older than the open session's start
    // (the carried state is the only out-of-order source — in-batch events
    // are sorted, so they form a prefix). Run gaps-and-islands over the
    // WHOLE early prefix first: deciding per event would split islands the
    // batch twin merges (a stray beyond the gap followed by a bridging
    // event inside it belong to ONE island reaching the open session).
    // Islands that do not bridge close as earlier sessions (renumbering
    // the open one after them); a bridging final island merges backwards.
    // Exact for late data newer than the last CLOSED session; anything
    // older would need renumbering already-emitted sessions, which append
    // mode cannot do — that is the documented horizon of single-pass
    // lateness handling.
    val pending =
      if (st == null) sorted
      else {
        val (early, rest) = sorted.span(e => micros(e.ts) < st.startUs)
        if (early.nonEmpty) {
          var islands = List.empty[(Long, Long, Long)] // (startUs, endUs, n), reversed
          var cs = micros(early.head.ts)
          var ce = cs
          var cn = 1L
          early.tail.foreach { e =>
            val us = micros(e.ts)
            if (us - ce > gapUs) { islands ::= ((cs, ce, cn)); cs = us; ce = us; cn = 1 }
            else { ce = us; cn += 1 }
          }
          islands ::= ((cs, ce, cn))
          val ordered = islands.reverse
          val bridges = st.startUs - ordered.last._2 <= gapUs
          val toClose = if (bridges) ordered.init else ordered
          toClose.foreach { case (s0, e0, n0) =>
            closed ::= SessionOut(userId, st.sessionIdx, formatUs(s0), formatUs(e0), n0)
            st = st.copy(sessionIdx = st.sessionIdx + 1)
          }
          if (bridges) {
            val (s0, _, n0) = ordered.last
            st = st.copy(startUs = math.min(st.startUs, s0), nEvents = st.nEvents + n0)
          }
        }
        rest
      }

    pending.foreach { e =>
      val us = micros(e.ts)
      if (st == null) {
        st = SessState(1, us, us, 1)
      } else if (us - st.lastUs > gapUs) {
        closed ::= SessionOut(userId, st.sessionIdx, formatUs(st.startUs),
          formatUs(st.lastUs), st.nEvents)
        st = SessState(st.sessionIdx + 1, us, us, 1)
      } else {
        // inside the open session's span (or within the gap after it):
        // extend, matching the batch twin's min/max-over-island semantics
        st = st.copy(startUs = math.min(st.startUs, us),
          lastUs = math.max(st.lastUs, us), nEvents = st.nEvents + 1)
      }
    }
    if (st != null) {
      state.update(st)
      // flush-by-timeout only applies under ProcessingTimeTimeout
      // (continuous runs); bounded runs use NoTimeout where this throws
      try state.setTimeoutDuration("30 minutes") catch {
        case _: UnsupportedOperationException => ()
      }
    }
    closed.reverse.iterator
  }

  /** Flush any still-open session from state (used after a bounded run,
    * where the source ends instead of timing out). */
  def finalSessions(open: Map[Long, SessState]): Seq[SessionOut] =
    open.toSeq.map { case (u, st) =>
      SessionOut(u, st.sessionIdx, formatUs(st.startUs), formatUs(st.lastUs), st.nEvents)
    }

  /** Run the sessionizer over the events table as an AvailableNow stream;
    * returns the sessions CLOSED by a gap during the run. Each user's final
    * session stays open in the state store when a bounded source ends (in a
    * continuous run the processing-time timeout would flush it) — the test
    * suite asserts the closed set equals the batch twin minus each user's
    * last session. */
  def run(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[SessEvent] = StreamSources.events(s, dir)
      .select(col("user_id").cast("long").as("user_id"),
              col("event_id").cast("long").as("event_id"), col("ts"))
      .as[SessEvent]
    // NoTimeout for the bounded AvailableNow run: with ProcessingTimeTimeout
    // the engine keeps scheduling empty micro-batches until wall-clock
    // timeouts fire (a 30-minute busy loop); a continuous deployment would
    // use ProcessingTimeTimeout so quiet users' sessions flush
    val tbl = s"graft_sessions_${runId.incrementAndGet()}"
    val q = ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(processGroup)
      .writeStream.format("memory").queryName(tbl)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(tbl)
  }

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)
}
