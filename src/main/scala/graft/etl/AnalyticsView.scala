package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** K5 pipeline parity: the denormalized analytics view
  * (`/root/reference/sql/make_view.sql:3-32`) — fact left-joined to the
  * role-playing locations dimension (start/end aliases), registered as a
  * temp view for the SQL surface, exactly the J9 shape.
  */
object AnalyticsView {

  val viewName = "graft_journey_view"

  /** Register the view over a warehouse populated by E1-E3; returns the
    * view's DataFrame. */
  def create(s: SparkSession, warehouse: String): DataFrame = {
    s.read.parquet(s"$warehouse/fact_journey").createOrReplaceTempView("graft_fact_journey")
    s.read.parquet(s"$warehouse/dim_locations").createOrReplaceTempView("graft_dim_locations")
    s.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW $viewName AS
         |SELECT f.rental_id,
         |       f.start_timestamp, f.end_timestamp,
         |       sl.name AS start_location_name,
         |       CONCAT(sl.lat, ',', sl.long) AS start_location_point,
         |       el.name AS end_location_name,
         |       CONCAT(el.lat, ',', el.long) AS end_location_point,
         |       f.start_weather_id, f.end_weather_id
         |FROM graft_fact_journey f
         |LEFT JOIN graft_dim_locations sl ON f.start_station_id = sl.id
         |LEFT JOIN graft_dim_locations el ON f.end_station_id = el.id""".stripMargin)
    s.table(viewName)
  }
}
