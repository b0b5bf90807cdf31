package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Partitioned warehouse write path (ref K1:
  * `/root/reference/spark/transform_load.py:58-90` — generic BigQuery writer
  * with mode + MONTH partition options; bootstrap switch at `:438,:496`).
  *
  * Re-expressed Spark-first: `partitionBy` parquet layout instead of a
  * warehouse connector. The partition column becomes the directory key, so a
  * later `.where(partCol === v)` prunes at the FILE level
  * (`PruneFileSourcePartitions`) — the Catalyst-native form of the
  * reference's month-partitioned table scans. At 100 TB the layout is what makes
  * incremental loads and time-bounded queries touch only their slice.
  */
object Warehouse {

  /** First run overwrites (bootstrap), subsequent runs append — the
    * reference's `if month == "201612": WRITE_TRUNCATE else WRITE_APPEND`
    * (`transform_load.py:438`). */
  def writePartitioned(df: DataFrame, partCol: String, path: String,
                       firstRun: Boolean): Unit =
    df.write
      .mode(if (firstRun) "overwrite" else "append")
      .partitionBy(partCol)
      .parquet(path)

  /** Partition-pruned read (ref S3/S4: path-level month selection,
    * `transform_load.py:261-263,465-483`). The equality predicate on the
    * partition column never reads non-matching directories. */
  def readPartition(s: SparkSession, path: String, partCol: String,
                    value: String): DataFrame =
    s.read.parquet(path).where(col(partCol) === value)
}
