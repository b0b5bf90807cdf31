package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** K4 pipeline parity: pre-created typed warehouse tables
  * (`/root/reference/airflow/dags/spark_transform_load.py:130-157,196-211` —
  * empty BigQuery tables created from JSON schemas with REQUIRED/NULLABLE
  * modes before any load runs).
  *
  * Spark-native form: catalog DDL over parquet locations. REQUIRED mode maps
  * to `nullable = false` in the declared `StructType`; creating the table
  * up-front pins the schema contract so later appends fail fast on drift
  * instead of silently widening.
  */
object Ddl {

  /** The reference's fact_journey schema (`assets/schema/make_schema.py:6-16`)
    * re-expressed as a StructType: ids REQUIRED, weather ids NULLABLE. */
  val factJourneySchema: StructType = StructType.fromDDL(
    "rental_id BIGINT NOT NULL, start_station_id INT, end_station_id INT, " +
      "start_weather_id STRING, end_weather_id STRING, " +
      "start_timestamp_id INT NOT NULL, end_timestamp_id INT NOT NULL, " +
      "start_timestamp TIMESTAMP NOT NULL, end_timestamp TIMESTAMP NOT NULL")

  /** The reference's rental dim schema (`make_schema.py:32-36`). */
  val rentalSchema: StructType = StructType.fromDDL(
    "id BIGINT NOT NULL, bike_id INT NOT NULL, duration INT")

  /** Create an empty typed external table at `location` (drops any previous
    * registration; the reference recreates tables idempotently too,
    * `spark_transform_load.py:150-156`).
    *
    * Note: Spark's analyzer relaxes nullability when reading file-source
    * tables (data files cannot enforce constraints), so REQUIRED mode is
    * enforced at load time via [[enforce]] — the same point BigQuery
    * enforces it (on insert), which is what the reference relies on. */
  def createEmptyTable(s: SparkSession, name: String, schema: StructType,
                       location: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"${f.name} ${f.dataType.sql}$nn"
    }.mkString(", ")
    s.sql(s"CREATE TABLE $name ($cols) USING parquet LOCATION '$location'")
  }

  /** Load-time contract check (the REQUIRED-mode rejection the reference
    * gets from BigQuery): fails fast if the frame's columns/types don't
    * match the declared schema or a REQUIRED column contains nulls. */
  def enforce(df: org.apache.spark.sql.DataFrame, schema: StructType): org.apache.spark.sql.DataFrame = {
    val declared = schema.fields.map(f => f.name -> f.dataType).toMap
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    require(actual == declared,
      s"schema mismatch: expected $declared, got $actual")
    val required = schema.fields.filterNot(_.nullable).map(_.name)
    if (required.nonEmpty) {
      import org.apache.spark.sql.functions._
      val nullCounts = df.select(required.toIndexedSeq.map(c =>
        count(when(col(c).isNull, lit(1))).as(c)): _*).first()
      required.zipWithIndex.foreach { case (c, i) =>
        require(nullCounts.getLong(i) == 0L,
          s"REQUIRED column $c contains ${nullCounts.getLong(i)} nulls")
      }
    }
    df
  }
}
