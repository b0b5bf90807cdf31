package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** In-Spark proofs for the round-12 fifth wave (the writer/serving
  * surface, q232–q237) — independent of the DuckDB oracle gate:
  * quantized-retrieval floors, calibration partition laws, skip-gram
  * symmetry, shard-manifest conservation + the two-phase-rank ≡
  * global-rank equivalence, the streaming top-k batch twin, and a
  * driver-side exact replay of the rolling correlation. */
class WriterWaveSpec extends AnyFunSuite {

  test("q232: int8 ranking recovers the full-precision top-10 almost" +
      " everywhere, and the readout is well-formed") {
    val rows = graft.SparkEntry.queries("q232_int8_recall")(spark, sfDir)
      .collect()
    assert(rows.length == 32, s"expected 32 probes, got ${rows.length}")
    val valid = (1 to 10).map(2520 / _).toSet + 0
    rows.foreach { r =>
      val (h, rr) = (r.getLong(1), r.getLong(2))
      assert(h >= 0 && h <= 10, s"probe ${r.getLong(0)}: n_hits10 $h")
      assert(valid.contains(rr.toInt), s"probe ${r.getLong(0)}: rr $rr")
      assert(h == 0 || rr > 0, "hits imply a ranked first hit")
    }
    val mean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    assert(mean >= 7.0,
      f"int8 quantization should preserve most of the top-10: mean $mean%.2f")
  }

  test("q233: buckets partition the corpus and the keep side matches q206") {
    val cal = graft.SparkEntry.queries("q233_calibration_audit")(spark, sfDir)
      .collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(cal.map(_.getLong(1)).sum == nDocs, "buckets must partition")
    cal.foreach { r =>
      val (b, n, sp, np, gap) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(b >= 0 && b <= 9, s"bucket $b out of range")
      assert(np >= 0 && np <= n, s"bucket $b: n_pos $np of $n")
      assert(sp >= 0 && sp <= n * 1000000L, s"bucket $b: sum_p $sp")
      assert(gap == math.abs(sp - np * 1000000L) / n,
        s"bucket $b: gap law violated")
    }
    // p >= S/2 ⇔ margin >= 0 (the hard-sigmoid midpoint IS the decision
    // rule), so the upper-half support must equal q206's total keeps
    val kept = cal.filter(_.getLong(0) >= 5).map(_.getLong(1)).sum
    val q206Keep = graft.SparkEntry.queries("q206_quality_scorecard")(
      spark, sfDir).collect().map(_.getLong(2)).sum
    assert(kept == q206Keep,
      s"calibration upper half $kept != scorecard keeps $q206Keep")
  }

  test("q234: the full pair table is exactly symmetric and subsampling" +
      " actually thins the hot head") {
    val full = TextAnalysisQueries
      .skipgramPairFrame(graft.Tables.documents(spark, sfDir))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(full.nonEmpty)
    full.foreach { case ((a, b), c) =>
      assert(full.get((b, a)).contains(c),
        s"pair ($a,$b)=$c has no mirror (${full.get((b, a))})")
    }
    // the hottest token must lose occurrences to the subsample: its
    // pair participation is far below the un-subsampled bound 4·f
    val toks = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val (hot, f) = {
      val r = toks.groupBy("tok").agg(count(lit(1)).as("f"))
        .orderBy(desc("f"), asc("tok")).first()
      (r.getString(0), r.getLong(1))
    }
    val nTotal = toks.count()
    // Mikolov keep prob = sqrt(N/(1024 f)); only meaningful if the head
    // is actually hot relative to the corpus
    assume(f * 4 > nTotal / 1024, "fixture head not hot enough to test")
    val participation = full.collect {
      case ((a, _), c) if a == hot => c
    }.sum
    assert(participation < 4 * f,
      s"hot token '$hot' (f=$f) should be thinned, saw $participation")
  }

  test("q235: shards are exactly balanced, conserve the corpus, and the" +
      " two-phase rank equals the independent global rank") {
    val got = graft.SparkEntry.queries("q235_shard_manifest")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val docs = graft.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val nToks = docs
      .select(expr("cast(size(split(text, ' ')) as bigint)").as("ntok"))
      .agg(sum("ntok")).first().getLong(0)
    assert(got.map(_._2).sum == nDocs, "doc conservation")
    assert(got.map(_._3).sum == nToks, "token conservation")
    assert(got.map(_._2).max - got.map(_._2).min <= 1, "exact ±1 balance")
    // independent formulation: ONE global row_number (fine in a test at
    // fixture scale; the production two-phase form must equal it bit
    // for bit because the bucket prefix is monotone in h)
    val w = org.apache.spark.sql.expressions.Window.orderBy("h", "doc_id")
    val want = docs
      .withColumn("h", expr("cast(conv(substring(md5(concat('shard_', " +
        "cast(doc_id as string))), 1, 8), 16, 10) as bigint)"))
      .withColumn("rank", row_number().over(w))
      .withColumn("shard", expr("cast((rank - 1) % 8 as bigint)"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("cast(size(split(text, ' ')) as bigint)")).as("tokens"),
        countDistinct("lang").as("n_langs"))
      .orderBy("shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q236: streaming per-window top-k == the batch window form on" +
      " finalized windows") {
    val got = graft.SparkEntry.queries("q236_streaming_topk")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty, "no finalized 6h windows — fixture span too short")
    val ev = graft.Tables.events(spark, sfDir)
    val maxTs = ev.agg(max("ts")).first().getTimestamp(0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("w")
      .orderBy(desc("vc"), asc("event_id"))
    val base = ev
      .withColumn("w", expr(
        "timestamp_micros((unix_micros(ts) div 21600000000) * 21600000000)"))
      .filter(expr("timestampadd(HOUR, 7, w)") <= lit(maxTs))
      .withColumn("vc", expr("cast(round(value * 100) as bigint)"))
    val nPerW = base.groupBy("w").agg(count(lit(1)).as("n_events"))
    val want = base
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .join(nPerW, Seq("w"))
      .select(date_format(col("w"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("n_events"), col("rank").cast("int"),
        col("event_id").cast("bigint"), col("vc"))
      .orderBy("ws", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q238: RBO replays exactly from the ranked sweep and is" +
      " consistent with q232's overlap") {
    val got = graft.SparkEntry.queries("q238_rank_agreement")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // driver-side exact replay: collect both rank columns and assemble
    // the dyadic-integer RBO independently of the fanout plan
    val ranked = SimilarityQueries.int8Ranked(spark, sfDir)
      .select("probe_id", "erank", "qrank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byProbe = ranked.groupBy(_._1)
    assert(got.keySet == byProbe.keySet.map(identity))
    byProbe.foreach { case (p, rows) =>
      val rbo = (1 to 10).map { d =>
        val ov = rows.count(t => t._2 <= d && t._3 <= d)
        (1L << (10 - d)) * (2520L / d) * ov
      }.sum
      assert(got(p)._1 == rbo, s"probe $p: rbo_num ${got(p)._1} != $rbo")
      assert(got(p)._2 == rbo * 1000000L / (2520L * 1023L),
        s"probe $p: rbo_e6 law")
    }
    // ov@10 IS q232's n_hits10, so the d=10 term ties the two readouts
    val recall = graft.SparkEntry.queries("q232_int8_recall")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    recall.foreach { case (p, h) =>
      assert(got(p)._1 >= 252L * h, s"probe $p: rbo below its d=10 floor")
      assert((got(p)._1 == 0L) == (h == 0L), s"probe $p: zero-law")
    }
  }

  test("q239: attribution conserves every touched purchase's cents" +
      " exactly") {
    val got = graft.SparkEntry.queries("q239_linear_attribution")(
      spark, sfDir).collect()
    val totalAttributed = got.map(_.getLong(3)).sum
    // independent conservation side: the cents of purchases that have
    // at least one click in the trailing 7 days (a semi-join, no
    // proration arithmetic shared with the query under test)
    val ev = graft.Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("ts").as("pts"),
        expr("cast(round(value * 100) as bigint)").as("vc"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val touched = p.join(c, Seq("user_id"))
      .filter(col("cts") <= col("pts") &&
        col("cts") >= expr("pts - INTERVAL 7 DAY"))
      .select("pid", "vc").distinct()
    val want = touched.agg(sum("vc")).first().getLong(0)
    assert(totalAttributed == want,
      s"attributed $totalAttributed != touched purchase cents $want")
    got.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      "touches per user can never undercut purchases"))
  }

  test("q240: the overlap matrix is a complete pair spine with exact" +
      " inclusion-exclusion bounds, and one cell re-derives directly") {
    val got = graft.SparkEntry.queries("q240_source_vocab_overlap")(
      spark, sfDir).collect()
    val sources = graft.Tables.documents(spark, sfDir)
      .select("source").distinct().count().toInt
    assert(got.length == sources * (sources - 1) / 2, "pair spine")
    got.foreach { r =>
      val (va, vb, sh, j) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      assert(sh <= math.min(va, vb), "intersection bound")
      assert(j >= 0 && j <= 1000000L, "jaccard range")
      assert(j == 1000000L * sh / (va + vb - sh), "jaccard law")
    }
    // re-derive one cell with a direct distinct-union count
    val r0 = got.head
    val docs = graft.Tables.documents(spark, sfDir)
    def vocab(src: String) = docs.filter(col("source") === src)
      .select(explode(split(col("text"), " ")).as("tok")).distinct()
    val union = vocab(r0.getString(0)).union(vocab(r0.getString(1)))
      .distinct().count()
    assert(union == r0.getLong(2) + r0.getLong(3) - r0.getLong(4),
      "inclusion-exclusion must match the direct union count")
  }

  test("q241: fertility laws — every word yields at least one token," +
      " every token at least one char, languages partition the corpus") {
    val got = graft.SparkEntry.queries("q241_tokenizer_fertility")(
      spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) >= 1, "n_words")
      assert(r.getLong(2) >= r.getLong(1), "tokens >= words")
      assert(r.getLong(3) >= 1000000L, "fertility >= 1 token/word")
      assert(r.getLong(4) >= 1000000L, "chars/token >= 1")
    }
    val nWords = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1).count()
    assert(got.map(_.getLong(1)).sum == nWords,
      "per-language word counts must partition the corpus")
  }

  test("q237: every correlation is a bounded e6 integer and the whole" +
      " matrix replays exactly from the daily counts") {
    val got = graft.SparkEntry.queries("q237_rolling_correlation")(
      spark, sfDir).collect()
    assert(got.nonEmpty)
    // driver-side exact replay over the (bounded) dense grid
    val daily = graft.Tables.events(spark, sfDir)
      .select(col("event_type").as("t"), col("ts").cast("date").as("d"))
      .groupBy("t", "d").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        r.getLong(2)).toMap
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    val days = daily.keys.map(_._2).toSeq.distinct.sorted
    def series(t: String): Seq[Long] = days.map(d => daily.getOrElse((t, d), 0L))
    val expect = (for {
      i <- types.indices; j <- (i + 1) until types.length
      (sa, sb) = (series(types(i)), series(types(j)))
      k <- days.indices
    } yield {
      val lo = math.max(0, k - 6)
      val (xs, ys) = (sa.slice(lo, k + 1), sb.slice(lo, k + 1))
      val n = xs.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val (num, d1, d2) = (n * sxy - sx * sy, n * sxx - sx * sx,
        n * syy - sy * sy)
      val c = if (d1 > 0 && d2 > 0)
        Some(math.floor(num.toDouble /
          (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble)) * 1e6).toLong)
      else None
      (types(i), types(j), days(k)) -> (n, c)
    }).toMap
    assert(got.length == expect.size, "matrix shape")
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1), r.getDate(2).toString)
      val (n, c) = expect(key)
      assert(r.getLong(3) == n, s"$key: n_days")
      val gc = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(gc == c, s"$key: corr $gc != $c")
      gc.foreach(v => assert(v >= -1000001L && v <= 1000000L,
        s"$key: corr $v out of bounds"))
    }
  }
}
