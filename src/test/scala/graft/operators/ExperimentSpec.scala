package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** Seventh-wave proofs: the streaming anomaly twin equals the batch
  * detector on finalized days, the A/B split is exhaustive and
  * assignment-stable, and collocation lift bookkeeping is consistent. */
class ExperimentSpec extends AnyFunSuite {

  test("q161 streaming detector == q148 batch detector on finalized days") {
    val maxTs = graft.Tables.events(spark, sfDir)
      .agg(max("ts")).head().getTimestamp(0)
    val horizon = new java.sql.Timestamp(
      maxTs.getTime - 25L * 3600 * 1000)
    val batch = TemporalQueries.q148DayAnomaly(spark, sfDir)
      .filter(col("d").cast("timestamp") <= lit(horizon))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3))).toSet
    val streamed = graft.streaming.StreamingQueries
      .q161StreamingAnomaly(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("q162 arm split is exhaustive and the t-stat is finite") {
    val row = SegmentationQueries.q162AbTest(spark, sfDir).head()
    val nUsers = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(row.getLong(0) + row.getLong(1) == nUsers)
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
    assert(math.abs(row.getLong(4)) < 100L * 1000000L, "t out of range")
  }

  test("q163 collocation counts are internally consistent") {
    val rows = TextAnalysisQueries.q163PmiCollocations(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (cp, cx, cy, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(cp <= cx && cp <= cy, "pair count exceeds a unigram count")
      assert(lift > 0.0)
    }
    // ranked descending
    val lifts = rows.map(_.getDouble(5))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("q169 streamed sessions == q164 batch sessions on finalized ends") {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    val maxTs = graft.Tables.events(spark, sfDir)
      .agg(max("ts")).head().getTimestamp(0).toLocalDateTime
    val batch = TemporalQueries.q164SessionWindow(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      // finalized = session end (already last event + gap) at least the
      // 1 h watermark behind max ts; the formatted end only ever rounds
      // DOWN, so compare on the second-truncated boundary both sides use
      .filter { case (_, _, end, _) =>
        !java.time.LocalDateTime.parse(end, fmt).isAfter(maxTs.minusHours(1)) }
      .toSet
    val streamed = graft.streaming.StreamingQueries
      .q169StreamingSessions(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("q173 clamped fold dominates the unclamped sum, and the clamp engages") {
    val rows = TemporalQueries.q173CappedBalance(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((u, net, fin) <- rows) {
      assert(fin >= 0, s"user $u negative balance")
      assert(fin >= math.max(0L, net),
        s"user $u: clamped fold $fin below unclamped floor ${math.max(0L, net)}")
    }
    // on real data the floor actually binds somewhere — otherwise this
    // operator would be a plain prefix sum and the fold is untested
    assert(rows.exists { case (_, net, fin) => fin > math.max(0L, net) },
      "clamp never engaged on the fixture")
  }

  test("q177 components cover exactly the matched vertices; survivors are minima") {
    val comps = DedupQueries.q177GoldenComponents(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comps.nonEmpty)
    val pairs = DedupQueries.q176Survivorship(spark, sfDir)
      .select("survivor_key", "merged_from").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val matched = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    // every matched customer lands in exactly one component
    assert(comps.map(_._2).sum == matched.size)
    // each survivor key is itself a matched vertex (the component min)
    assert(comps.forall { case (k, _) => matched(k) })
    // transitivity: components can only merge pairs, never split them —
    // at least as many pair rows as (n_members - 1) edges per component
    assert(pairs.length >= comps.map(_._2 - 1).sum)
  }

  test("q164 sessions partition each user's events with >= 30 min gaps") {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    val rows = TemporalQueries.q164SessionWindow(spark, sfDir)
      .collect().map(r => (r.getLong(0),
        java.time.LocalDateTime.parse(r.getString(1), fmt),
        java.time.LocalDateTime.parse(r.getString(2), fmt),
        r.getLong(3)))
    assert(rows.nonEmpty)
    val total = graft.Tables.events(spark, sfDir).count()
    assert(rows.map(_._4).sum == total, "session counts must sum to all events")
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val seq = rs.sortBy(_._2.toString)
      for (Array(a, b) <- seq.sliding(2).map(_.toArray)) {
        // next session starts at or after the previous end (= last
        // event + 30 min); whole-second formatting can only round the
        // boundary down, hence the 1-second tolerance
        assert(!b._2.isBefore(a._3.minusSeconds(1)),
          s"user $u sessions overlap: ${a._3} then ${b._2}")
      }
    }
  }
}
