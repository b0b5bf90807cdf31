package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** E1 pipeline parity: `setup_database`
  * (`/root/reference/spark/transform_load.py:403-422`) — generate the
  * timestamp dimension and build the locations dimension, then write both
  * to the warehouse.
  *
  * Fixture mapping (SURVEY.md §7): stations → nation; the timestamp grid is
  * generated, not scanned, exactly as the reference's
  * `explode(sequence(...))` (`transform_load.py:104-120`) — but parallel:
  * one `range` row per day fans the generation across partitions instead of
  * producing millions of rows in a single task.
  */
object SetupDatabase {

  /** Minute-grid timestamp dimension (ref `transform_load.py:104-120`):
    * unix-seconds surrogate key + calendar projections. Grid construction
    * is shared with the oracle-checked queries (q17/q19) so the warehouse
    * dimension and the query surface can never drift apart. */
  def timestampDimension(s: SparkSession, days: Int = 31): DataFrame =
    graft.operators.RelationalQueries.minuteGrid(s, days)
      .withColumnRenamed("ts", "timestamp")
      .select(
        unix_timestamp(col("timestamp")).cast("int").as("id"),
        col("timestamp"),
        year(col("timestamp")).cast("int").as("year"),
        month(col("timestamp")).cast("int").as("month"),
        dayofmonth(col("timestamp")).cast("int").as("dayofmonth"),
        weekofyear(col("timestamp")).cast("int").as("weekofyear"),
        hour(col("timestamp")).cast("int").as("hour"),
        minute(col("timestamp")).cast("int").as("minute"))

  /** Locations dimension with the reference's decimal coordinate casts
    * (ref `transform_load.py:141-154`: rename + DECIMAL(8,6)/(9,6)). */
  def locationsDimension(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir).select(
      col("n_nationkey").cast("int").as("id"),
      col("n_name"),
      concat(lit("T"), col("n_nationkey")).as("terminal_name"),
      (expr("cast((n_nationkey * 37) % 180 - 90 as double)") / 1000.0)
        .cast("decimal(8,6)").as("lat"),
      (expr("cast((n_nationkey * 73) % 360 - 180 as double)") / 1000.0)
        .cast("decimal(9,6)").as("long"))
      // single-column rename, the reference's station-name rename shape
      // (transform_load.py:141)
      .withColumnRenamed("n_name", "name")
      .select("id", "name", "terminal_name", "lat", "long")

  /** Run E1: write dim_timestamp (day-partitioned, overwrite) and
    * dim_locations (ref write calls `transform_load.py:410-422`). */
  def run(s: SparkSession, dir: String, warehouse: String): Unit = {
    val ts = timestampDimension(s)
      .withColumn("day", date_format(col("timestamp"), "yyyy-MM-dd"))
    Warehouse.writePartitioned(ts, "day", s"$warehouse/dim_timestamp", firstRun = true)
    locationsDimension(s, dir)
      .write.mode("overwrite").parquet(s"$warehouse/dim_locations")
  }
}
