package graft

import org.scalatest.funsuite.AnyFunSuite

/** The streaming state stores at 100 TB: the default HDFSBackedStateStore
  * keeps every key's state on the executor HEAP, which caps total state
  * at aggregate executor memory — the RocksDB provider (bundled with
  * Spark) spills to local disk and is the production choice once
  * dedup/session/join state outgrows the heap. This spec runs the
  * suite's heaviest stateful topologies on a RocksDB-backed session and
  * asserts results identical to the default provider — proving the
  * engine's state usage (dropDuplicatesWithinWatermark, chained stateful
  * operators, two-sided interval-join buffers) is provider-agnostic and
  * the scale knob is a one-line conf. */
class RocksDbStateSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val rocks = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2
  }

  test("the RocksDB provider actually engages (parity must not be vacuous)") {
    // if a Spark upgrade renamed/ignored the conf key, the rocks session
    // would silently fall back to the default provider and the parity
    // tests would compare identical providers — so assert RocksDB metrics
    // appear in a stateful query's progress on the rocks session
    val tbl = "graft_rocks_probe"
    val q = graft.streaming.StreamSources.events(rocks, sfDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "1 hour"))
      .count()
      .writeStream.format("memory").queryName(tbl).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val metricKeys = q.recentProgress.flatMap(_.stateOperators)
      .flatMap(_.customMetrics.keySet.toArray.map(_.toString)).toSet
    assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
      s"expected rocksdb state-store metrics, got: $metricKeys")
  }

  test("q52 exactly-once dedup matches across state-store providers") {
    val viaRocks = graft.streaming.StreamingQueries.q52StreamingDedup(rocks, sfDir).collect()
    val viaDefault = graft.streaming.StreamingQueries.q52StreamingDedup(spark, sfDir).collect()
    assert(viaRocks.toSeq === viaDefault.toSeq)
    assert(viaRocks.nonEmpty)
  }

  test("q72 stream-stream interval join matches across state-store providers") {
    val viaRocks = graft.streaming.StreamingQueries.q72StreamStreamJoin(rocks, sfDir).collect()
    val viaDefault = graft.streaming.StreamingQueries.q72StreamStreamJoin(spark, sfDir).collect()
    assert(viaRocks.toSeq === viaDefault.toSeq)
    assert(viaRocks.nonEmpty)
  }

  test("q107 KMV sketch state round-trips through RocksDB identically") {
    // the TypedImperativeAggregate's serialized buffer is what lives in
    // the store — a provider that mangled serialize/deserialize would
    // corrupt the sketch, so windowed estimates must match exactly
    val viaRocks = graft.streaming.StreamingQueries.q107StreamingKmv(rocks, sfDir).collect()
    val viaDefault = graft.streaming.StreamingQueries.q107StreamingKmv(spark, sfDir).collect()
    assert(viaRocks.toSeq === viaDefault.toSeq)
    assert(viaRocks.nonEmpty)
  }

  test("q169 session-window merge state matches across state-store providers") {
    // session windows MERGE state entries (ranges coalesce as events
    // arrive) — the provider operation mix differs from plain window
    // aggregation, so parity here is not implied by the q52/q107 cases
    val viaRocks = graft.streaming.StreamingQueries.q169StreamingSessions(rocks, sfDir).collect()
    val viaDefault = graft.streaming.StreamingQueries.q169StreamingSessions(spark, sfDir).collect()
    assert(viaRocks.toSeq === viaDefault.toSeq)
    assert(viaRocks.nonEmpty)
  }
}
