package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, max, unix_micros}
import org.scalatest.funsuite.AnyFunSuite

/** SCD Type-2 semantics of the q102 core on constructed edges (run
  * collapse, range chaining, the high-date sentinel) plus the structural
  * invariants every Type-2 dimension must satisfy, checked over the
  * fixture: consecutive versions, chained validity ranges, exactly one
  * current row per key, and no same-segment adjacent versions. */
class Scd2Spec extends AnyFunSuite {
  import graft.SparkTestSession.{sfDir, spark}
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)
  private val sentinel = "9999-12-31 00:00:00.000000"

  test("constructed runs collapse with chained ranges and a sentinel tail") {
    val events = Seq(
      (1L, ts(1000), 7L, "click", 0.0, "{}"),
      (2L, ts(2000), 7L, "click", 0.0, "{}"),
      (3L, ts(3000), 7L, "view", 0.0, "{}"),
      (4L, ts(4000), 7L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EtlQueries.scd2Runs(events)
      .as[(Long, Long, String, String, String, Long, Boolean)].collect().toSeq
    def fmt(ms: Long) = {
      val sdf = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS000")
      sdf.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      sdf.format(new java.util.Date(ms))
    }
    assert(out === Seq(
      (7L, 1L, "click", fmt(1000), fmt(3000), 2L, false),
      (7L, 2L, "view", fmt(3000), fmt(4000), 1L, false),
      (7L, 3L, "click", fmt(4000), sentinel, 1L, true)))
  }

  test("q113's incremental merge equals the full rebuild, non-vacuously") {
    val full = EtlQueries.q102Scd2Dimension(spark, sfDir)
      .as[(Long, Long, String, String, String, Long, Boolean)].collect().toSeq
    val inc = EtlQueries.q113Scd2Incremental(spark, sfDir)
      .as[(Long, Long, String, String, String, Long, Boolean)].collect().toSeq
    assert(inc === full, "incremental maintenance must be indistinguishable from a rebuild")
    // non-vacuity: the delta must touch SOME users but not all — otherwise
    // the test proves nothing about the carry-forward or rebuild paths
    val raw = graft.Tables.events(spark, sfDir)
    val dayUs = 86400L * 1000000L
    val cutoff = (raw.agg(max(unix_micros(col("ts")))).head().getLong(0) / dayUs) * dayUs
    val touched = raw.filter(unix_micros(col("ts")) >= cutoff)
      .select("user_id").distinct().count()
    val allUsers = raw.select("user_id").distinct().count()
    assert(touched > 0L, "the delta must touch some users")
    assert(touched < allUsers || allUsers == 1L,
      s"expected untouched users to exercise the carry path ($touched of $allUsers touched)")
  }

  test("fixture invariants: consecutive versions, chained ranges, one current") {
    val rows = EtlQueries.q102Scd2Dimension(spark, sfDir)
      .as[(Long, Long, String, String, String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.length.toLong),
        s"user $user versions not consecutive")
      sorted.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._5 === b._4, s"user $user ranges not chained")
        assert(a._3 !== b._3, s"user $user adjacent versions share a segment")
        assert(a._4 < b._4, s"user $user effective_from not increasing")
      }
      assert(sorted.count(_._7) === 1, s"user $user current-count != 1")
      assert(sorted.last._7 && sorted.last._5 === sentinel,
        s"user $user tail not the open sentinel version")
      assert(vs.map(_._6).sum >= sorted.length,
        s"user $user n_events below version count")
    }
  }
}
