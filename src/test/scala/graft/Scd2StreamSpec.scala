package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SCD2 maintenance (streaming/Scd2Stream.scala) composes the
  * q113 incremental rebuild with the upsert-sink discipline. Proof
  * obligations (the StreamingIndexDedupSpec pattern):
  *   - after draining the whole events table through micro-batches, the
  *     stream-maintained dimension EQUALS q102's batch full rebuild;
  *   - after a FULL REDELIVERY (fresh checkpoint, same files — the
  *     exactly-once worst case), it still equals the full rebuild: the
  *     append lake deduplicates on read and touched users converge to
  *     their final chains. */
class Scd2StreamSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("stream-maintained SCD2 dim == q102 full rebuild, also after full redelivery") {
    val ev = Tables.events(spark, sfDir)

    // deliver the events table as 4 separate parquet files so the stream
    // sees several micro-batches with overlapping users
    val tmp = Staging.fresh("scd2s_tmp")
    val inDir = Staging.fresh("scd2s_in")
    ev.withColumn("slice", expr("cast(pmod(event_id, 4) as int)"))
      .repartition(4, col("slice")).drop("slice")
      .write.mode("overwrite").parquet(s"$tmp/b")
    val parts = Option(new java.io.File(s"$tmp/b").listFiles())
      .getOrElse(fail(s"no staging dir at $tmp/b"))
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
    assert(parts.length > 1, "need multiple files for multiple micro-batches")
    parts.zipWithIndex.foreach { case (f, i) =>
      Files.copy(f.toPath, Paths.get(s"$inDir/b_$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }

    val lake = Staging.fresh("scd2s_lake") + "/events"
    val dim = Staging.fresh("scd2s_dim") + "/dim"
    val schema = spark.read.parquet(s"$inDir/b_0.parquet").schema

    def drain(): Unit = {
      val q = graft.streaming.Scd2Stream.attach(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*.parquet"),
        lake, dim, Staging.fresh("scd2s_ck"))
      q.awaitTermination()
    }

    def dimRows(): Seq[(Long, Long, String, String, String, Long, Boolean)] =
      graft.streaming.Scd2Stream.readDim(spark, dim)
        .select("user_id", "version", "segment", "effective_from",
          "effective_to", "n_events", "is_current")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getString(4), r.getLong(5), r.getBoolean(6)))
        .sortBy(t => (t._1, t._2)).toSeq

    val expected = graft.operators.EtlQueries.q102Scd2Dimension(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4), r.getLong(5), r.getBoolean(6)))
      .sortBy(t => (t._1, t._2)).toSeq

    drain()
    val first = dimRows()
    assert(first.nonEmpty)
    assert(first == expected,
      "stream-maintained dimension must equal the batch full rebuild")

    // full redelivery: fresh checkpoint, same input files
    drain()
    assert(dimRows() == expected,
      "redelivery must leave the dimension unchanged (convergent maintenance)")
  }
}
