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
}
