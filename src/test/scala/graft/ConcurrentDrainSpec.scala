package graft

import java.util.concurrent.{Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** Two streaming drains AT ONCE on one parent session — the scenario the
  * old set/restore `withBoundedState` could not survive (a drain's
  * temporary shuffle-partition override was visible to whatever else the
  * session ran, and two interleaved restores could strand the wrong
  * value). Each drain now runs on its own child session
  * (StreamSources.boundedStateSession), so the override is scoped to the
  * stream that owns it and the parent's conf never moves.
  */
class ConcurrentDrainSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("two concurrent drains leave the parent conf untouched and both match the sequential result") {
    val key = "spark.sql.shuffle.partitions"
    val parentBefore = spark.conf.get(key)
    // sequential ground truth first (each call drains its own topology)
    val seqHourly = graft.streaming.StreamingQueries
      .q36StreamingHourly(spark, sfDir).collect().toSeq
    val seqHopping = graft.streaming.StreamingQueries
      .q124StreamingHopping(spark, sfDir).collect().toSeq
    val pool = Executors.newFixedThreadPool(2)
    try {
      val fHourly = pool.submit(() => graft.streaming.StreamingQueries
        .q36StreamingHourly(spark, sfDir).collect().toSeq)
      val fHopping = pool.submit(() => graft.streaming.StreamingQueries
        .q124StreamingHopping(spark, sfDir).collect().toSeq)
      assert(fHourly.get(300, TimeUnit.SECONDS) == seqHourly)
      assert(fHopping.get(300, TimeUnit.SECONDS) == seqHopping)
    } finally pool.shutdownNow()
    assert(spark.conf.get(key) == parentBefore)
  }

  test("the child session's override never leaks into the parent") {
    val key = "spark.sql.shuffle.partitions"
    val parentBefore = spark.conf.get(key)
    val child = graft.streaming.StreamSources.boundedStateSession(spark)
    assert(child.conf.get(key) ==
      sys.env.getOrElse("GRAFT_STREAM_STATE_PARTITIONS", "4"))
    assert(spark.conf.get(key) == parentBefore)
    // builder-level configs ride the shared SparkConf into the child —
    // the inheritance the streaming readers depend on (UTC parity,
    // nanosAsLong dispatch, extensions-injected functions)
    assert(child.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(!child.sessionState.functionRegistry
      .lookupFunction(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kmv"))
      .isEmpty)
  }
}
