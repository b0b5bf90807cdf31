package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Ordered-funnel semantics of the q103 core on constructed edges: stage
  * order matters (a click BEFORE the first view does not qualify), each
  * stage is strictly after the previous (same-timestamp does not count),
  * and users missing a stage drop out of the later counts. */
class FunnelSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("ordered progression, strictness, and drop-out accounting") {
    val events = Seq(
      // user 1: clean view -> click -> purchase
      (1L, ts(1000), 1L, "view", 0.0, "{}"),
      (2L, ts(2000), 1L, "click", 0.0, "{}"),
      (3L, ts(3000), 1L, "purchase", 0.0, "{}"),
      // user 2: click BEFORE the view — click must not qualify, so the
      // purchase (which needs a qualified click) must not either
      (4L, ts(1000), 2L, "click", 0.0, "{}"),
      (5L, ts(2000), 2L, "view", 0.0, "{}"),
      (6L, ts(3000), 2L, "purchase", 0.0, "{}"),
      // user 3: view then purchase, no click
      (7L, ts(1000), 3L, "view", 0.0, "{}"),
      (8L, ts(2000), 3L, "purchase", 0.0, "{}"),
      // user 4: never views
      (9L, ts(1000), 4L, "signup", 0.0, "{}"),
      // user 5: click at the SAME timestamp as the view — strictly-after
      // fails, click must not qualify
      (10L, ts(1000), 5L, "view", 0.0, "{}"),
      (11L, ts(1000), 5L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = RelationalQueries.funnelStages(events)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1, "view", 4L, 1.0),
      (2, "view_click", 1L, 0.25),
      (3, "view_click_purchase", 1L, 1.0)))
  }

  test("fixture funnel is monotone with conversions in (0, 1]") {
    val out = RelationalQueries.q103Funnel(spark, graft.SparkTestSession.sfDir)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out.map(_._2) === Seq("view", "view_click", "view_click_purchase"))
    assert(out.sliding(2).forall { case Seq(a, b) => b._3 <= a._3; case _ => true },
      "stage counts must be non-increasing")
    assert(out.forall(r => r._4 > 0.0 && r._4 <= 1.0))
  }
}
