package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** In-Spark differential proofs for the round-12 fourth wave —
  * independent of the DuckDB oracle gate: the streaming trailing-24h
  * sliding distinct (q227) against its batch twin computed with the
  * same decomposition but no streaming machinery, and the truncation
  * recall audit's (q228) identity + bounds properties. */
class RollingAuditSpec extends AnyFunSuite {

  test("q227: streaming trailing-24h distinct == batch twin on finalized hours") {
    val got = graft.SparkEntry.queries("q227_streaming_sliding_distinct")(
      spark, sfDir).collect().map(r => (r.getString(0), r.getLong(1)))
    // batch twin: same decomposition, no stream, finalization cut applied
    // as a plain filter (wh + 3 h <= max event hour — the exact cut the
    // append-mode watermark enforces)
    val eh = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("HOUR", col("ts")).as("eh"))
      .distinct()
    val maxEh = eh.agg(max("eh")).first().getTimestamp(0)
    val want = eh
      .select(col("user_id"), explode(expr("sequence(0, 23)")).as("off"), col("eh"))
      .select(col("user_id"), expr("timestampadd(HOUR, off, eh)").as("wh"))
      .distinct()
      .filter(expr("timestampadd(HOUR, 3, wh)") <= lit(maxEh))
      .groupBy("wh")
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("wh"), "yyyy-MM-dd HH:mm:ss"), col("n"))
      .orderBy("wh")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty, "no finalized windows — fixture span too short")
    assert(got.toSeq === want.toSeq)
  }

  test("q227: every emitted hour's count is bounded by lifetime distinct users") {
    val got = graft.SparkEntry.queries("q227_streaming_sliding_distinct")(
      spark, sfDir).collect()
    val nUsers = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    got.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= nUsers,
        s"hour ${r.getString(0)} count ${r.getLong(1)} outside [1, $nUsers]")
    }
  }

  test("q228: truncating to the full dimension is the identity — perfect recall") {
    val r = SimilarityQueries.truncationRecall(spark, sfDir, tdim = 64).collect()
    assert(r.length === 32)
    r.foreach { row =>
      assert(row.getLong(1) === 10L,
        s"probe ${row.getLong(0)}: full-width truncation must recover all 10")
      assert(row.getLong(2) === 2520L,
        s"probe ${row.getLong(0)}: first hit must sit at rank 1")
    }
  }

  test("q229: negative side agrees with q194, margins and kinds are consistent") {
    val trip = graft.SparkEntry.queries("q229_triplet_mining")(spark, sfDir)
      .collect()
    assert(trip.nonEmpty, "fixture yields no triplets — mining is inert")
    // q229's negative is exactly q194's hard negative for every anchor
    // that also has a positive (q229 anchors are a subset of q194's)
    val hard = graft.SparkEntry.queries("q194_hard_negatives")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(4)))).toMap
    trip.foreach { r =>
      val (anchor, negId, negCos) = (r.getLong(0), r.getLong(4), r.getDouble(5))
      assert(hard.contains(anchor), s"anchor $anchor absent from q194")
      assert(hard(anchor) === ((negId, negCos)),
        s"anchor $anchor: negative ${(negId, negCos)} != q194 ${hard(anchor)}")
      val (posCos, margin, kind) =
        (r.getDouble(3), r.getLong(6), r.getString(7))
      assert(margin === math.floor((posCos - negCos) * 1e6).toLong)
      assert(kind === (if (negCos >= posCos) "hard" else "semi_hard"))
    }
  }

  test("q230: member verdicts re-derive from the standalone filters") {
    val ens = graft.SparkEntry.queries("q230_filter_ensemble")(spark, sfDir)
      .collect()
    // rules member == q215's per-source pass counts, source for source
    val rules = graft.SparkEntry.queries("q215_rules_gate")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_pass")).toMap
    ens.foreach { r =>
      assert(r.getAs[Long]("n_pass_rules") === rules(r.getString(0)),
        s"source ${r.getString(0)}: rules member diverges from q215")
    }
    // repetition member == q61's keep verdicts plus the short-doc pass-through
    val q61keep = graft.SparkEntry.queries("q61_repetition_ratio")(spark, sfDir)
      .collect().count(_.getAs[Boolean]("keep_doc")).toLong
    val shortDocs = graft.Tables.documents(spark, sfDir)
      .filter(expr("size(split(text, ' ')) < 3")).count()
    assert(ens.map(_.getAs[Long]("n_pass_rep")).sum === q61keep + shortDocs)
    // internal consistency: unanimity is the floor of every pairwise count
    ens.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val pairs = Seq("n_agree_rules_lm", "n_agree_rules_rep", "n_agree_lm_rep")
        .map(r.getAs[Long])
      val unanimous = r.getAs[Long]("unanimous_share_e6") * n / 1000000L
      pairs.foreach(p => assert(p >= 0L && p <= n))
      assert(r.getAs[Long]("n_pass_all") <= Seq("n_pass_rules", "n_pass_lm",
        "n_pass_rep").map(r.getAs[Long]).min)
      assert(pairs.forall(_ >= r.getAs[Long]("n_pass_all")),
        "a pairwise agreement count cannot undercut the all-pass count")
      assert(unanimous <= pairs.min + 1)
    }
  }

  test("q231: fanout decomposition == an independent driver-side window median") {
    val got = graft.SparkEntry.queries("q231_sliding_median")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3)))
    val rows = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("cast(ts as date)").as("d"), col("value"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val byType = rows.groupBy(_._1)
    val want = byType.toSeq.flatMap { case (t, rs) =>
      rs.map(_._2).distinct.sorted((a: java.time.LocalDate, b: java.time.LocalDate) =>
        a.compareTo(b)).map { d =>
        val w = rs.filter(r => !r._2.isAfter(d) && !r._2.isBefore(d.minusDays(6)))
          .map(_._3).sorted
        // interpolated median, the percentile/quantile_cont convention
        val n = w.length
        val med = if (n % 2 == 1) w(n / 2) else {
          val (lo, hi) = (w(n / 2 - 1), w(n / 2))
          lo + (hi - lo) * 0.5
        }
        (t, d.toString, n.toLong, med)
      }
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq === want)
  }

  test("q228: recall and reciprocal-rank bounds, and a nontrivial fixture floor") {
    val r = graft.SparkEntry.queries("q228_truncation_recall")(spark, sfDir)
      .collect()
    assert(r.length === 32)
    r.foreach { row =>
      val (hits, rr) = (row.getLong(1), row.getLong(2))
      assert(hits >= 0L && hits <= 10L)
      // rr = 2520 div r for r in 1..10, or 0 on a total miss — and the
      // two miss signals must agree
      assert(rr == 0L || (rr >= 252L && rr <= 2520L))
      assert((hits == 0L) === (rr == 0L))
    }
    // 16 of 64 dims must retain SOME signal on the fixture (a dead-zero
    // audit would mean the truncated metric is noise — worth failing on)
    assert(r.map(_.getLong(1)).sum >= 32L,
      "mean recall@10 below 1 hit/probe — truncated metric carries no signal")
  }
}
