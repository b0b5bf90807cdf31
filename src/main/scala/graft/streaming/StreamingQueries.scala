package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** Structured Streaming surface (SURVEY.md §2.10).
  *
  * The reference is batch-incremental: Airflow cron triggers monthly
  * append-mode loads (`/root/reference/airflow/dags/spark_transform_load
  * .py:262,314-315`; append writes `transform_load.py:438,496`). The
  * Spark-native form of that loop is a file-source stream processed with
  * `Trigger.AvailableNow` — "consume whatever has arrived, then stop" —
  * which is exactly a scheduled incremental load, but with exactly-once
  * file tracking and watermarked event-time semantics for free.
  *
  * At scale the same topology runs continuously: the file source discovers
  * new partitions as the lake grows, the watermark bounds state, and the
  * windowed aggregation state lives in the state store instead of a
  * re-scanned warehouse.
  */
object StreamingQueries {

  private val runCounter = new AtomicInteger(0)

  /** Event-time tumbling-window count (the dashboard's journeys-over-time
    * series, `/root/reference/README.md:29-35`, in streaming form): file
    * source → watermark → 1-hour window → AvailableNow → memory sink.
    *
    * Append mode: only FINALIZED windows — those whose end precedes the
    * final watermark (max event time − 1 h) — are emitted; the state store
    * then drops them, so state stays bounded in a continuous deployment
    * (complete mode would retain every window forever and the watermark
    * would evict nothing). For a bounded source the emitted set is exactly
    * the batch aggregate minus the windows still inside the lateness
    * horizon, which the oracle twin expresses with a HAVING on max(ts):
    * window_end ≤ max(ts) − 1 h  ⇔  hour + 2 h ≤ max(ts). */
  def q36StreamingHourly(s: SparkSession, dir: String): DataFrame = {
    val ev = StreamSources.events(s, dir)
    val tbl = s"graft_stream_hourly_${runCounter.incrementAndGet()}"
    val q = ev
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      // formatted string, not bare TimestampType (tz-adjusted vs naive —
      // see EtlQueries q32)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"), col("cnt"))
      .writeStream
      .format("memory")
      .queryName(tbl)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(tbl).orderBy("h")
  }

  /** Streaming DEDUP under at-least-once delivery (the LLM-pipeline event
    * path: upstream producers redeliver, downstream counts must not double):
    * the same events file feeds TWO file sources whose union redelivers
    * every row twice, then `dropDuplicatesWithinWatermark(event_id)`
    * restores exactly-once semantics before the windowed count. State for a
    * key is dropped once the watermark passes its event time — bounded, the
    * same contract as the window state — where plain
    * `dropDuplicates(event_id)` would pin every key forever. Chained
    * stateful operators (dedup → windowed agg) propagate the watermark
    * through both stores. The dedup restores the source's distinct set, so
    * the finalized-window oracle is q36's — a double-delivered stream that
    * hash-matches the clean batch aggregate IS the test. */
  def q52StreamingDedup(s: SparkSession, dir: String): DataFrame = {
    val redelivered = StreamSources.events(s, dir).union(StreamSources.events(s, dir))
    val tbl = s"graft_stream_dedup_${runCounter.incrementAndGet()}"
    val q = redelivered
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"), col("cnt"))
      .writeStream
      .format("memory")
      .queryName(tbl)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(tbl).orderBy("h")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_streaming_hourly" -> (q36StreamingHourly _),
    "q52_streaming_dedup" -> (q52StreamingDedup _),
  )

  val oracles: Map[String, String] = Map(
    "q36_streaming_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1
        |HAVING date_trunc('hour', any_value(ts)) + INTERVAL 2 HOUR
        |  <= (SELECT max(ts) FROM events)
        |ORDER BY h""".stripMargin,
    // after exactly-once restoration the double-delivered stream must equal
    // the clean batch aggregate — deliberately the same SQL as q36's
    "q52_streaming_dedup" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1
        |HAVING date_trunc('hour', any_value(ts)) + INTERVAL 2 HOUR
        |  <= (SELECT max(ts) FROM events)
        |ORDER BY h""".stripMargin,
  )
}
