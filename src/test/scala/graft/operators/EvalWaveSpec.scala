package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** In-Spark differential proofs for the round-10 evaluation wave —
  * independent of the DuckDB oracle gate: the two-phase group
  * quantiles and IQR gate against naive single-window forms, the
  * transition matrix's probability rows, and session-count agreement
  * between q196 and q164. */
class EvalWaveSpec extends AnyFunSuite {

  test("q184 two-phase group quantiles == naive window selection") {
    val base = graft.Tables.events(spark, sfDir)
      .select(col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("v"),
        col("event_id").as("ei"))
    val w = Window.partitionBy("g").orderBy("v", "ei")
    val naive = base
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("g")
      .agg(first("n").as("n"),
        min(when(col("rn") === expr("(50 * (n - 1)) div 100 + 1"), col("v"))).as("p50"),
        min(when(col("rn") === expr("(90 * (n - 1)) div 100 + 1"), col("v"))).as("p90"),
        min(when(col("rn") === expr("(99 * (n - 1)) div 100 + 1"), col("v"))).as("p99"))
      .select(col("g"), col("n"), col("p50"), col("p90"), col("p99"))
      .orderBy("g").collect().toSeq
    val twoPhase = SegmentationQueries.q184GroupQuantiles(spark, sfDir)
      .select(col("event_type"), col("n_events"), col("p50_cents"),
        col("p90_cents"), col("p99_cents"))
      .collect().toSeq
    assert(twoPhase.nonEmpty && twoPhase.map(_.toSeq) == naive.map(_.toSeq))
  }

  test("q192 outlier counts match a naive quartile-fence recomputation") {
    val base = graft.Tables.events(spark, sfDir)
      .select(col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("v"),
        col("event_id").as("ei"))
    val w = Window.partitionBy("g").orderBy("v", "ei")
    val q = base
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("g")
      .agg(min(when(col("rn") === expr("(25 * (n - 1)) div 100 + 1"), col("v"))).as("q1"),
        min(when(col("rn") === expr("(75 * (n - 1)) div 100 + 1"), col("v"))).as("q3"))
    val naive = base.join(q, Seq("g"))
      .groupBy("g")
      .agg(sum(when(lit(2L) * col("v") < lit(5L) * col("q1") - lit(3L) * col("q3"), 1L)
          .otherwise(0L)).as("lo"),
        sum(when(lit(2L) * col("v") > lit(5L) * col("q3") - lit(3L) * col("q1"), 1L)
          .otherwise(0L)).as("hi"))
      .orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val gate = SegmentationQueries.q192IqrOutliers(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(gate == naive && gate.nonEmpty)
  }

  test("q189 transition probabilities: each row sums to ~1 (floor slack <= cells)") {
    val rows = TemporalQueries.q189TransitionMatrix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byFrom = rows.groupBy(_.getString(0))
    for ((f, rs) <- byFrom) {
      val s = rs.map(_.getLong(3)).sum
      assert(s <= 1000000L && s >= 1000000L - rs.length,
        s"$f: p_e6 row sum $s outside the floor-slack band")
    }
  }

  test("q197 offset premise: daily counts sit far below the 1e6 slope offset") {
    // the Theil-Sen sort key adds 1e6*dq before the integer divide so
    // the numerator stays positive (truncation == floor in both
    // engines); |dp| < 1e6*dq needs max daily count < 1e6
    val mx = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date"))
      .count().agg(max("count")).head().getLong(0)
    assert(mx < 1000000L, s"daily count $mx breaks the q197 offset premise")
  }

  test("q196 session totals == q164's session count") {
    val q164Sessions = TemporalQueries.q164SessionWindow(spark, sfDir).count()
    val q196Total = TemporalQueries.q196SessionEntryExit(spark, sfDir)
      .agg(sum("n_sessions")).head().getLong(0)
    assert(q196Total == q164Sessions && q196Total > 0)
  }
}
