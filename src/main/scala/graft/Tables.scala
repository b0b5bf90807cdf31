package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's parquet tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` — Catalyst handles column pruning and filter
  * pushdown into the scan; nothing to hand-roll. At 100 TB the same call
  * reads a partitioned directory tree and `PruneFileSourcePartitions`
  * turns `.where(month === m)` into partition pruning.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped in two fixture encodings: parquet
    * TIMESTAMP(NANOS) (rounds ≤7; with nanosAsLong it arrives as long
    * nanoseconds — truncate to microseconds, same as DuckDB's ns→us read,
    * and restore TimestampType; `div` is floor division, which matches
    * DuckDB only for non-negative epochs — fine for the 2024-only fixture)
    * and TIMESTAMP_MICROS with isAdjustedToUTC=false (round 8+; Spark
    * reads TIMESTAMP_NTZ — reinterpret the wall clock as an instant, which
    * under the session's pinned UTC zone is exactly DuckDB's naive read).
    *
    * The ONE shared conversion for batch and streaming readers
    * (StreamSources.events calls this) — a change to the fixture encoding
    * cannot leave one reader shifted against the other. */
  private[graft] def restoreEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }

  def events(s: SparkSession, d: String): DataFrame =
    restoreEventTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
