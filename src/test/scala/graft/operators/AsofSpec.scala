package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Constructed-edge semantics for the as-of join core (q99's union+window
  * construction; the oracle cross-checks it against DuckDB's native ASOF
  * on the fixture, this spec pins the edges where the expected match is
  * known exactly): strictly-prior matching (a same-timestamp touch must
  * NOT match), latest-of-several selection, per-user isolation, and the
  * no-prior-touch null row. */
class AsofSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("strictly-prior, latest-wins, per-user, and null-when-none semantics") {
    val events = Seq(
      // user 1: touch at 1000, touch at 2000, purchase at 2000 (same ts!),
      // purchase at 3000
      (10L, ts(1000), 1L, "click", 1.0, "{}"),
      (11L, ts(2000), 1L, "view", 1.0, "{}"),
      (12L, ts(2000), 1L, "purchase", 5.0, "{}"),
      (13L, ts(3000), 1L, "purchase", 5.0, "{}"),
      // user 2: purchase with NO prior touch, then a touch AFTER it
      (20L, ts(1500), 2L, "purchase", 5.0, "{}"),
      (21L, ts(1600), 2L, "signup", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = RelationalQueries.asofLastTouch(events).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getString(3)))).toSeq
    assert(out === Seq(
      // purchase 12 at ts 2000 must NOT see the ts-2000 view (strict <):
      // its last touch is the ts-1000 click
      (12L, Some(10L), Some("click")),
      // purchase 13 sees the ts-2000 view (latest prior beats the click)
      (13L, Some(11L), Some("view")),
      // purchase 20 has no prior touch; user 2's later signup and user 1's
      // touches must not leak in
      (20L, None, None)))
  }
}
