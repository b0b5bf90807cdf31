package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The production ingest topology the bucketed fingerprint index exists
  * for, run end to end: a crawl batch ARRIVES AS A STREAM, and each
  * micro-batch is fingerprinted and verdicted against the durable
  * bucketed index inside `foreachBatch`, landing in a verdict lake. The
  * recurring cost is exactly the design's promise — the corpus prints
  * are never re-fingerprinted and never re-shuffled (PlanShapeSpec's q85
  * assertion applies to the identical join); the stream just feeds new
  * batches through it. The verdicts must equal the batch computation on
  * the same slice — composition of streaming delivery, catalog tables,
  * and the verdict join is what per-operator tests cannot see. */
class StreamingIndexDedupSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}
  import graft.operators.DedupQueries

  test("a streamed crawl batch is verdicted against the bucketed index exactly as in batch") {
    val docs = Tables.documents(spark, sfDir)
    val (rFp, rNfp) = DedupQueries.writeFingerprintIndex(
      docs.filter(col("doc_id") % 10 =!= 7), 8,
      Staging.fresh("sidx"), "graft_sidx_stream")
    val (fpT, nfpT) = (rFp.table, rNfp.table)

    // deliver this week's slice as parquet files in a stream source dir
    val batch = docs.filter(col("doc_id") % 10 === 7)
    val inDir = Staging.fresh("sidx_in")
    val tmp = Staging.fresh("sidx_tmp")
    batch.write.mode("overwrite").parquet(s"$tmp/b")
    // listFiles() is null (not empty) when the dir is missing — surface a
    // useful assertion instead of an opaque NPE if the staging write failed
    Option(new java.io.File(s"$tmp/b").listFiles())
      .getOrElse(fail(s"staging write produced no directory at $tmp/b"))
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
      .zipWithIndex.foreach { case (f, i) =>
        Files.copy(f.toPath, Paths.get(s"$inDir/b_$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }

    val out = Staging.fresh("sidx_out") + "/verdicts"
    val q = spark.readStream.schema(batch.schema).parquet(s"$inDir/*.parquet")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        DedupQueries.incrementalDedupBucketed(
            b.sparkSession, DedupQueries.fingerprints(b), fpT, nfpT)
          .write.mode("append").parquet(out)
      }
      .option("checkpointLocation", Staging.fresh("sidx_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val direct = DedupQueries.incrementalDedupBucketed(
        spark, DedupQueries.fingerprints(batch), fpT, nfpT)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === direct.toSeq)
    // and the verdict mix is non-trivial on the fixture
    assert(streamed.map(_._2).toSet.contains("keep"))
  }
}
