package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** E2 pipeline parity: `transform_load_weather`
  * (`/root/reference/spark/transform_load.py:425-449`) — assemble the daily
  * weather dimension from three per-measure sources via a 2-key left join
  * (J1, `:266-273`), derive the unix surrogate key (`:277-279`) and the
  * composite `"{loc}_{ts}"` id (`:283-285`), and append-write month
  * partitions with the first-month overwrite bootstrap (`:438`).
  *
  * Fixture mapping: `events` plays the weather sources — three event types
  * become the three measures (rainfall/tasmin/tasmax), (user_id, date)
  * plays (location_id, time). All three branches aggregate from one scan
  * and join on the same key, so the shuffles share partitioning.
  */
object TransformWeather {

  private def measure(s: SparkSession, dir: String, typ: String, name: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === typ)
      .groupBy(col("user_id").as("location_id"), col("ts").cast("date").as("time"))
      .agg(avg(col("value")).as(name))

  /** The assembled weather dimension for one run (all days here; a month
    * slice in the reference's loop). */
  def weatherDimension(s: SparkSession, dir: String): DataFrame = {
    val rainfall = measure(s, dir, "click", "rainfall")
    val tasmin = measure(s, dir, "view", "tasmin")
    val tasmax = measure(s, dir, "purchase", "tasmax")
    rainfall
      .join(tasmin, Seq("location_id", "time"), "left")
      .join(tasmax, Seq("location_id", "time"), "left")
      .withColumn("timestamp", col("time").cast("timestamp"))
      .withColumn("timestamp_id", unix_timestamp(col("timestamp")).cast("int"))
      .withColumn("id", concat_ws("_", col("location_id"), col("timestamp_id")))
      .select("id", "location_id", "timestamp_id", "timestamp",
        "rainfall", "tasmin", "tasmax")
  }

  /** Run E2 with the overwrite-vs-append bootstrap switch
    * (ref `transform_load.py:438`). */
  def run(s: SparkSession, dir: String, warehouse: String, firstRun: Boolean): Unit = {
    val dim = weatherDimension(s, dir)
      .withColumn("ym", date_format(col("timestamp"), "yyyy-MM"))
    Warehouse.writePartitioned(dim, "ym", s"$warehouse/dim_weather", firstRun)
  }
}
