package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential tests for the two interval-logic joins — the
  * operators whose Spark-native forms (sorted-window carry-forward for
  * as-of, hour-bucket explode + containment for range) are farthest from
  * their specification. A driver-side brute force over a seeded random
  * event log is the referee; any boundary slip (inclusive/exclusive,
  * bucket edge, tie on timestamp) diverges here even though the fixture
  * oracle — being one fixed dataset — might never exercise it. */
class JoinEquivalenceSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark

  private case class Ev(eventId: Long, tsUs: Long, userId: Long, typ: String)

  /** ~2000 events over 20 users across 3 days, second-ish resolution so
    * ties and exact boundary hits actually occur. */
  private lazy val events: Seq[Ev] = {
    val rnd = new scala.util.Random(7)
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    val types = Array("click", "error", "purchase", "view")
    (0 until 2000).map { i =>
      Ev(i.toLong, base + rnd.nextInt(259200).toLong * 1000000L,
        rnd.nextInt(20).toLong, types(rnd.nextInt(types.length)))
    }
  }

  private lazy val dir: String = {
    import spark.implicits._
    val d = graft.Staging.fresh("jeq")
    events.map(e => (e.eventId, e.tsUs, e.userId, e.typ))
      .toDF("event_id", "tsUs", "user_id", "event_type")
      .selectExpr("event_id", "timestamp_micros(tsUs) as ts", "user_id",
        "event_type", "cast(0.0 as double) as value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q56 as-of join equals a brute-force last-click-before scan") {
    val expected = events.filter(_.typ == "error").map { e =>
      val clicks = events.filter(c =>
        c.typ == "click" && c.userId == e.userId && c.tsUs <= e.tsUs)
      val gap = if (clicks.isEmpty) -1L else e.tsUs - clicks.map(_.tsUs).max
      (e.userId, e.eventId, gap)
    }.sortBy(e => (e._1, e._2))
    val got = RelationalQueries.q56AsofJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q57 range join equals a brute-force per-session containment count") {
    // session bounds are UTC-formatted strings — parse them as UTC
    // explicitly (Timestamp.valueOf would use the JVM default zone)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    def toUs(v: String): Long =
      java.time.LocalDateTime.parse(v, fmt).toInstant(java.time.ZoneOffset.UTC)
        .toEpochMilli * 1000L
    val sessions = RelationalQueries.q39Sessionize(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        toUs(r.getString(2)), toUs(r.getString(3))))
    assert(sessions.nonEmpty)
    val expected = sessions.map { case (u, idx, stUs, enUs) =>
      val n = events.count(e => e.userId == u && e.tsUs >= stUs && e.tsUs <= enUs)
      (u, idx, n.toLong)
    }.sortBy(e => (e._1, e._2))
    val got = RelationalQueries.q57RangeJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val diffs = expected.zipAll(got, null, null).filter { case (a, b) => a != b }
    assert(diffs.isEmpty, s"first diffs (expected vs got): ${diffs.take(5)}")
  }
}
