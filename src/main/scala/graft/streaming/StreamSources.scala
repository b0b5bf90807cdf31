package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared streaming source construction: the events table as a file-source
  * stream. The TIMESTAMP(NANOS) restore is delegated to
  * graft.Tables.restoreEventTs — the single conversion both the batch and
  * streaming readers go through.
  */
object StreamSources {

  /** File-source streams must be given a schema up front (no inference at
    * plan time), which costs a batch footer probe per call. The probed
    * schema is a pure function of the source files, so it caches per
    * corpus fingerprint ([[graft.CorpusKey]] — mtime/size/name-set, the
    * same key discipline as every staged index): a fixture regeneration
    * re-probes, repeat constructions in one JVM (q63 builds four sources
    * from two tables; every bench trial rebuilds its sources) don't. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private def probedSchema(s: SparkSession, dir: String, table: String): StructType =
    schemaCache.computeIfAbsent(graft.CorpusKey(dir, table),
      _ => s.read.parquet(s"$dir/$table").schema)

  /** Run `body` (a start + awaitTermination of one bounded streaming
    * topology) with the shuffle-partition count — which fixes the state
    * store's partition fan-out for the lifetime of the query's checkpoint
    * — bounded low. State partitioning is a per-pipeline DEPLOYMENT
    * knob, not a semantics knob: every stateful operator writes one delta
    * file per state partition per micro-batch to the checkpoint, so a
    * harness-scale keyspace under the session's 32 batch partitions pays
    * 8× the checkpoint fan-out for zero parallelism win (the state fits
    * in one). A 100 TB deployment sizes this UP with key cardinality and
    * throughput (GRAFT_STREAM_STATE_PARTITIONS overrides) — the knob and
    * the reasoning are the point; 4 is the measured local-fixture
    * optimum (q52 A/B medians: 4 ≈ 2 < 8 < 32, the last gap ~2×).
    * Results are partition-count-independent (hash
    * partitioning on the group key only moves rows between stores), which
    * the oracle parity of every streaming query continues to check. */
  private[graft] def withBoundedState[T](s: SparkSession)(body: => T): T = {
    // NOTE: this temporarily mutates the SESSION-GLOBAL shuffle-partition
    // conf and restores it in finally — safe under the harness's strictly
    // sequential query execution (one drain at a time per session), but a
    // concurrent or nested query on the same SparkSession would observe
    // the temporary value. A multi-tenant deployment should scope the
    // override with SparkSession.newSession() per stream instead.
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, sys.env.getOrElse("GRAFT_STREAM_STATE_PARTITIONS", "4"))
    try body
    finally s.conf.set(key, prev)
  }

  /** readStream over the events parquet (file-source streams need a
    * directory/glob, not a bare file path — hence basePath + glob). */
  def events(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    graft.Tables.restoreEventTs(
      s.readStream.schema(probedSchema(s, dir, "events.parquet"))
        .option("basePath", dir).parquet(s"$path*"))
  }

  /** readStream over the documents parquet — the text-ingest stream for
    * content-based dedup (no timestamp restore needed; documents carry no
    * nanosecond columns). */
  def documents(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    s.readStream.schema(probedSchema(s, dir, "documents.parquet"))
      .option("basePath", dir).parquet(s"$path*")
  }
}
