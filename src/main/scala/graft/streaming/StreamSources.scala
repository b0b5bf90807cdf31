package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared streaming source construction: the events table as a file-source
  * stream. The TIMESTAMP(NANOS) restore is delegated to
  * graft.Tables.restoreEventTs — the single conversion both the batch and
  * streaming readers go through.
  */
object StreamSources {

  /** readStream over the events parquet (file-source streams need a
    * directory/glob, not a bare file path — hence basePath + glob). */
  def events(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val batchSchema = s.read.parquet(path).schema
    graft.Tables.restoreEventTs(
      s.readStream.schema(batchSchema)
        .option("basePath", dir).parquet(s"$path*"))
  }

  /** readStream over the documents parquet — the text-ingest stream for
    * content-based dedup (no timestamp restore needed; documents carry no
    * nanosecond columns). */
  def documents(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val batchSchema = s.read.parquet(path).schema
    s.readStream.schema(batchSchema)
      .option("basePath", dir).parquet(s"$path*")
  }
}
