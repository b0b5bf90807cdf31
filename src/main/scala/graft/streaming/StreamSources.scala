package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Shared streaming source construction: the events table as a file-source
  * stream. Mirrors graft.Tables.events' TIMESTAMP(NANOS) handling (the
  * fixture stores nanos; with nanosAsLong the column arrives as a long to
  * truncate back to microsecond timestamps) — kept in ONE place so a
  * change to the fixture encoding cannot leave a streaming reader shifted
  * against the batch loaders.
  */
object StreamSources {

  /** readStream over the events parquet (file-source streams need a
    * directory/glob, not a bare file path — hence basePath + glob). */
  def events(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val batchSchema = s.read.parquet(path).schema
    val stream = s.readStream.schema(batchSchema)
      .option("basePath", dir).parquet(s"$path*")
    if (batchSchema("ts").dataType == LongType)
      stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else stream
  }
}
