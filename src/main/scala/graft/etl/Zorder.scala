package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-interleaved) partition layout for multi-dimensional
  * range pruning — the lakehouse OPTIMIZE ZORDER idea expressed with
  * plain partition directories, no table format required.
  *
  * A 1-D partitioning (the reference's month dirs,
  * `/root/reference/spark/transform_load.py:438`) prunes range queries
  * on ITS key only; a query constraining two dimensions still reads
  * every file of the surviving slices. Interleaving the bucket bits of
  * two keys into one partition value gives a grid of cells where a
  * (range x range) rectangle maps to a SMALL, driver-enumerable set of
  * cells — pruning multiplies across dimensions instead of applying on
  * one. The cell id is bijective with the bucket pair, so the rewritten
  * `zb IN (cells)` filter is EXACT — no residual row filter is needed
  * for bucket-granular predicates, and partition pruning (the q30
  * machinery) does all the work before any file opens.
  *
  * At 100 TB: 3+3 bits is the fixture geometry; production widens to
  * 8-16 bits per dimension with the same arithmetic, and the layout
  * write is the same one-time bootstrap as Warehouse's bucketed tables
  * (ZorderSpec asserts the scan reads only the rectangle's cells). */
object Zorder {

  /** Bits per dimension: 8 x 8 buckets -> 64 cells. */
  val bits = 3
  val side: Int = 1 << bits

  /** Morton-interleave two bucket ids (driver-side twin of [[zExpr]]). */
  def z(a: Int, b: Int): Int =
    (0 until bits).map { i =>
      (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))
    }.sum

  /** SQL form of [[z]] over columns `ub`, `db` (div/mod bit extraction —
    * codegen'd integer arithmetic, no UDF). */
  private def zExpr: String =
    (0 until bits).map { i =>
      s"(ub div ${1 << i} % 2) * ${1 << (2 * i)} + (db div ${1 << i} % 2) * ${1 << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** All cell ids covered by a bucket rectangle (driver-enumerable:
    * |ubs| * |dbs| cells, each a partition directory). */
  def rectangleCells(ubs: Seq[Int], dbs: Seq[Int]): Seq[Int] =
    for { a <- ubs; b <- dbs } yield z(a, b)

  /** The two bucket dimensions of the events layout: user bucket and
    * day-of-month slice (4-day stripes -> 8 buckets; the fixture's
    * events span one month — a production layout would stripe
    * day-of-year or week the same way). */
  private def bucketed(events: DataFrame): DataFrame = events
    .withColumn("ub", expr(s"cast(user_id % $side as int)"))
    .withColumn("db", expr(s"cast((dayofmonth(ts) - 1) div 4 as int)"))
    .withColumn("zb", expr(s"cast($zExpr as int)"))

  /** One layout per source FINGERPRINT (graft.CorpusKey over the events
    * part files — round 11: the bare-dir key let an in-session regen
    * serve a stale path for the JVM lifetime), cached per JVM and
    * DURABLE across JVMs (graft.etl.Layouts: a later session re-attaches
    * via the manifest — zero rebuild jobs — and a regenerated source dir
    * misses the fingerprint check and rebuilds, so the pre-round-9
    * stale-on-regen hazard is gone; CacheFingerprintSpec proves the
    * in-session regen miss too). computeIfAbsent locks per key: one dir's first
    * build no longer serializes an unrelated dir's behind it (the
    * fpIndexCache idiom, unified per round-8 advice). */
  private val layouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Test hook: simulate a fresh JVM (the durable layout remains). */
  private[graft] def resetCacheForTest(): Unit = layouts.clear()

  def layoutFor(s: SparkSession, dir: String): String =
    layouts.computeIfAbsent(graft.CorpusKey(dir, "events.parquet"), _ =>
      graft.etl.Layouts.attachOrBuild(s, "zorder", s"v1;bits=$bits", dir,
        Seq("events")) { base =>
        val path = s"$base/data"
        bucketed(graft.Tables.events(s, dir))
          // one task per cell -> one file per partition dir
          .repartition(col("zb"))
          .write.mode("overwrite").partitionBy("zb").parquet(path)
        (Nil, path)
      }.dataPath)

  /** Rectangle read: partition pruning via the exact cell enumeration. */
  def readRectangle(s: SparkSession, dir: String,
                    ubs: Seq[Int], dbs: Seq[Int]): DataFrame = {
    val cells = rectangleCells(ubs, dbs)
    s.read.parquet(layoutFor(s, dir))
      .filter(col("zb").isin(cells: _*))
  }
}
