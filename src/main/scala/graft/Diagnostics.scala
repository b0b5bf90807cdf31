package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality diagnostics (SURVEY.md §2.13): the reference's
  * `get_column_types_from_df` logger (`/root/reference/spark/
  * transform_load.py:38-55`) — schema traversal plus a one-pass per-column
  * null-count profile — as a library function returning a DataFrame instead
  * of log lines.
  */
object Diagnostics {

  /** One row per column: name, Spark type, null count, total count. The
    * null counts come from a single aggregation pass (no per-column jobs). */
  def schemaProfile(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val cols = df.columns.toIndexedSeq
    val aggRow = df.select(
      (cols.map(c => count(when(col(c).isNull, lit(1))).as(s"n_$c")) :+
        count(lit(1)).as("n_total")): _*).first()
    val total = aggRow.getLong(cols.size)
    cols.zipWithIndex.map { case (c, i) =>
      (c, df.schema(c).dataType.simpleString, df.schema(c).nullable,
        aggRow.getLong(i), total)
    }.toDF("column", "type", "nullable", "n_nulls", "n_rows")
  }
}
