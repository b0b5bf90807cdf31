package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The production sink the streaming docstrings name, made real: a
  * file-source stream lands in a partitioned parquet lake through
  * `foreachBatch` + `Warehouse.upsertPartitions` (dynamic partition
  * overwrite). The exactly-once claim of that topology is NOT the
  * checkpoint (which only dedups file discovery within one stream
  * lineage) — it is that re-delivering data rewrites the same partitions
  * instead of appending duplicates. The test simulates the worst case:
  * the whole stream replayed from scratch with a fresh checkpoint, twice.
  * The lake must be byte-count-identical, where an append sink would have
  * doubled.
  *
  * PRECONDITION (this is what the topology requires, not a test
  * convenience): each trigger must deliver every partition it touches IN
  * FULL — true for `AvailableNow` full reloads (this test) and for
  * ingest cadences aligned with the partition key (a daily batch into a
  * day-partitioned lake). If one partition's rows were split across two
  * micro-batches, the second overwrite would drop the first batch's rows;
  * finer triggers need a (partition, batchId) layout or a MERGE-capable
  * table format instead. `Warehouse.upsertPartitions` documents the same
  * constraint. */
class StreamingSinkSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("foreachBatch + dynamic partition upsert is idempotent under full redelivery") {
    val lake = Staging.fresh("fbsink") + "/events_lake"
    def deliverAll(): Unit = {
      val ckpt = Staging.fresh("fbck") // fresh checkpoint = full replay
      val q = graft.streaming.StreamSources.events(spark, sfDir)
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
    val expected = Tables.events(spark, sfDir).count()
    deliverAll()
    val first = spark.read.parquet(lake).count()
    deliverAll() // full redelivery — an append sink would double the lake
    val second = spark.read.parquet(lake).count()
    assert(first === expected)
    assert(second === expected)
    // and the partition layout is the pruned-read warehouse shape
    val day = spark.read.parquet(lake).where(col("day") === "2024-01-02")
    assert(day.count() > 0)
  }
}
