package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** In-Spark differential proofs for the round-12 governance wave —
  * independent of the DuckDB oracle gate: q242's flagged matches are
  * true near-duplicates under exact recomputation, q243's shrinkage
  * lands between the raw and prior rates, q244's kappa replays exactly
  * from its own contingency cells, q245/q246's shares obey their
  * conservation laws, and q247's streamed histogram quantiles equal a
  * batch recomputation. */
class GovernanceWaveSpec extends AnyFunSuite {

  test("q242 flagged rows are true near-duplicates of true bench vectors") {
    val out = SimilarityQueries.q242SemanticDecontaminate(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) % 37 != 0, "corpus side must exclude bench ids")
      assert(r.getLong(2) % 37 == 0, "best match must be a bench id")
      assert(r.getLong(1) >= 1L)
    }
    // exact recomputation of each (vec, best_bench) cosine — the flag
    // may under-report (band recall), but never over-report
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    val pairs = SimilarityQueries.q242SemanticDecontaminate(spark, sfDir)
      .select(col("vec_id").as("fid"), col("best_bench_id").as("bb"), col("best_cos"))
      .join(e.as("x"), col("fid") === col("x.vec_id"))
      .join(e.as("y"), col("bb") === col("y.vec_id"))
      .withColumn("re", expr("graft_dot(x.v, y.v) / (x.nrm * y.nrm)"))
      .select(col("best_cos"), col("re")).collect()
    pairs.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "reported cosine must replay exactly")
      assert(r.getDouble(1) >= 0.35)
    }
  }

  test("q243 shrunk rate lies between the raw rate and the global prior") {
    val rows = QualityFilterQueries.q243SourcePrior(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, prior, shrunk) = (r.getLong(3), r.getLong(4), r.getLong(5))
      // floor rounding can place the e6 readout one unit outside
      assert(shrunk >= math.min(raw, prior) - 1 && shrunk <= math.max(raw, prior) + 1,
        s"source ${r.getString(0)}: shrunk=$shrunk outside [$raw, $prior]")
    }
  }

  test("q244 kappa replays exactly from its own contingency cells") {
    val rows = QualityFilterQueries.q244FilterKappa(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (n, a, b, c, d) =
        (BigInt(r.getLong(1)), BigInt(r.getLong(2)), BigInt(r.getLong(3)),
          BigInt(r.getLong(4)), BigInt(r.getLong(5)))
      assert(a + b + c + d == n)
      val x = (a + b) * (a + c) + (c + d) * (b + d)
      val num = n * (a + d) - x
      val den = (n * n - x).max(BigInt(1))
      val expect =
        if (num >= 0) (BigInt(1000000) * num) / den
        else -((BigInt(1000000) * -num) / den)
      assert(BigInt(r.getLong(8)) == expect, s"pair ${r.getString(0)}")
      assert(r.getLong(8) >= -1000000L && r.getLong(8) <= 1000000L)
      assert(r.getLong(6) >= 0L && r.getLong(6) <= 1000000L)
      assert(r.getLong(7) >= 0L && r.getLong(7) <= 1000000L)
    }
  }

  test("q245 diversity counters obey their conservation laws") {
    val rows = TextAnalysisQueries.q245NgramDiversity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (types, grams, singles, top) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(singles <= types && types <= grams && top >= 1L && top <= grams)
      assert(r.getLong(5) <= 1000000L && r.getLong(6) <= 1000000L &&
        r.getLong(7) <= 1000000L)
    }
    val totalGrams = graft.Tables.documents(spark, sfDir)
      .select(expr("split(text, ' ')").as("t")).filter(expr("size(t) >= 3"))
      .agg(sum(expr("size(t) - 2"))).first().getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalGrams)
  }

  test("q246 OOV instances conserve the corpus token count") {
    val rows = TextAnalysisQueries.q246OovRate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(4) <= r.getLong(3))
      assert(r.getLong(5) <= 1000000L && r.getLong(6) <= 1000000L)
    }
    val totalTokens = graft.Tables.documents(spark, sfDir)
      .agg(sum(expr("size(split(text, ' '))"))).first().getLong(0)
    assert(rows.map(_.getLong(1)).sum == totalTokens)
  }

  test("q249's pair arithmetic equals the materialized join's row count") {
    val out = RelationalQueries.q249JoinCardinality(spark, sfDir).collect()
    val total = out.find(_.getString(0) == "total").get
    val joined = graft.Tables.events(spark, sfDir).select(col("user_id").as("k"))
      .join(graft.Tables.orders(spark, sfDir).select(col("o_custkey").as("k")), "k")
      .count()
    assert(total.getLong(4) == joined,
      "sum of per-key count products must equal the real join size")
    val keys = out.filter(_.getString(0) == "key")
    assert(keys.length == 5)
    keys.foreach(r => assert(r.getLong(2) * r.getLong(3) == r.getLong(4)))
  }

  test("q250 deletion conserves and the lake actually shrinks") {
    val rows = EtlQueries.q250TakedownDelete(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) - r.getLong(2) == r.getLong(3),
        s"source ${r.getString(0)}: before - deleted != after (lake rewrite broken)")
    }
    val expectHits = graft.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 101 = 0")).count()
    assert(rows.map(_.getLong(2)).sum == expectHits && expectHits > 0)
  }

  test("q251 (one sketch buffer per window) == q247 ((window,bin) state)") {
    val a = graft.streaming.StreamingQueries
      .q247StreamingQuantiles(spark, sfDir).collect().toSeq.map(_.toSeq)
    val b = graft.streaming.StreamingQueries
      .q251StreamingHist(spark, sfDir).collect().toSeq.map(_.toSeq)
    assert(a.nonEmpty && a == b)
  }

  test("q252 conserves purchases: every purchase lands in exactly one row") {
    val rows = EtlQueries.q252PitJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalPurchases = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == totalPurchases,
      "chained SCD2 ranges must match each purchase at most once, " +
        "and the left join must keep unmatched ones")
  }

  test("q253 union arithmetic ties out against both detectors") {
    val rows = DedupQueries.q253ContaminationReport(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lex, sem, both, any) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(both <= math.min(lex, sem))
      assert(any == lex + sem - both, "inclusion-exclusion must hold per source")
    }
    val lexDocs = DedupQueries.q64Decontaminate(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == lexDocs)
    val semDocs = SimilarityQueries.q242SemanticDecontaminate(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir),
        col("vec_id") === col("doc_id"), "left_semi").count()
    assert(rows.map(_.getLong(3)).sum == semDocs)
  }

  test("q255 (stream-static PIT) == q252 (batch PIT)") {
    val a = EtlQueries.q252PitJoin(spark, sfDir).collect().toSeq.map(_.toSeq)
    val b = graft.streaming.StreamingQueries.q255StreamingPit(spark, sfDir)
      .collect().toSeq.map(_.toSeq)
    assert(a.nonEmpty && a == b)
  }

  test("q256's compaction mechanism collapses files and conserves rows") {
    val path = graft.Staging.fresh("compact_spec")
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.repartition(8, col("event_id"))
      .write.partitionBy("day").mode("overwrite").parquet(path)
    val before = EtlQueries.partFileCounts(path)
    val rowsBefore = spark.read.parquet(path).count()
    graft.etl.Warehouse.upsertPartitions(
      spark.read.parquet(path).repartition(col("day")), "day", path)
    val after = EtlQueries.partFileCounts(path)
    assert(before.keySet == after.keySet)
    assert(before.values.sum > after.values.sum, "compaction must shrink file count")
    assert(after.values.forall(_ == 1), "one file per partition after compaction")
    assert(spark.read.parquet(path).count() == rowsBefore)
  }

  test("q254 quotas conserve the budget exactly and follow the weights") {
    val rows = QualityFilterQueries.q254QualityMixture(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(3)).sum == 1000000L, "sum of quotas == budget")
    // monotone: a strictly higher weight never gets a smaller quota
    val byW = rows.sortBy(r => (r.getLong(2), r.getLong(3)))
    byW.sliding(2).foreach {
      case Array(lo, hi) =>
        if (hi.getLong(2) > lo.getLong(2))
          assert(hi.getLong(3) >= lo.getLong(3))
      case _ =>
    }
  }

  test("q257 block counts conserve text length through the codec round-trip") {
    val rows = TextAnalysisQueries.q257AudioSegments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "active <= blocks")
      assert(r.getLong(4) <= r.getLong(3), "segments <= active blocks")
    }
    val expectBlocks = graft.Tables.documents(spark, sfDir)
      .agg(sum(expr("(length(text) + 7) div 8"))).first().getLong(0)
    assert(rows.map(_.getLong(2)).sum == expectBlocks,
      "decoded sample count must equal the synthesized character count")
  }

  test("q258 confusion cells conserve and tie out against q205's accuracy") {
    val rows = QualityFilterQueries.q258ClassifierEval(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)
        == r.getLong(1), "tp+fp+fn+tn must equal n_docs")
    }
    val q205 = QualityFilterQueries.q205TrainQualityFilter(spark, sfDir)
      .collect().head
    val correct = rows.map(r => r.getLong(2) + r.getLong(5)).sum
    assert(correct == q205.getLong(5),
      "sum of per-source tp+tn must equal q205's global n_correct")
  }

  test("q259 lift cells are internally consistent") {
    val rows = SimilarityQueries.q259ClusterSourceBalance(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)),
        "cell count bounded by both marginals")
      assert(r.getLong(6) == math.abs(r.getLong(5) - 1000000L),
        "deviation must replay from the lift")
    }
    // ranked by deviation, descending
    rows.sliding(2).foreach {
      case Array(hi, lo) => assert(hi.getLong(6) >= lo.getLong(6))
      case _ =>
    }
  }

  test("q260 frame counts conserve text length through the demux") {
    val rows = TextAnalysisQueries.q260VideoScenes(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "scenes <= frames")
      assert(r.getLong(4) <= r.getLong(2), "longest <= frames")
    }
    val totalChars = graft.Tables.documents(spark, sfDir)
      .agg(sum(expr("length(text)"))).first().getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalChars,
      "every character must demux to exactly one frame")
  }

  test("q261's day-sketch rollup equals one-pass direct aggregation") {
    val roll = SegmentationQueries.q261HistRollup(spark, sfDir).collect().head
    val direct = graft.Tables.events(spark, sfDir)
      .select(expr("least(511L, greatest(0L, cast(floor(value) as bigint)))").as("bin"))
      .groupBy("bin").agg(count(lit(1)).cast("bigint").as("cnt"))
      .orderBy("bin").collect()
    val n = direct.map(_.getLong(1)).sum
    def sel(num: Long, den: Long): Long = {
      var cum = 0L
      direct.collectFirst {
        case r if { cum += r.getLong(1); den * cum >= num * n } => r.getLong(0)
      }.get
    }
    assert(roll.getLong(1) == n)
    assert(roll.getLong(2) == sel(1, 2) && roll.getLong(3) == sel(19, 20) &&
      roll.getLong(4) == sel(99, 100))
  }

  test("q262 decorrelates: counts match explicit semi/anti joins, no subquery at runtime") {
    val rows = RelationalQueries.q262ExistsSubquery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cust = graft.Tables.customer(spark, sfDir)
    val ord = graft.Tables.orders(spark, sfDir)
    val big = cust.join(ord.filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("c_custkey")).distinct(),
      Seq("c_custkey"), "left_semi")
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val never = cust.join(ord.select(col("o_custkey").as("c_custkey")).distinct(),
      Seq("c_custkey"), "left_anti")
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == big.getOrElse(r.getString(0), 0L))
      assert(r.getLong(3) == never.getOrElse(r.getString(0), 0L))
    }
  }

  test("q263 recall rises with the cosine band and never exceeds 1") {
    val rows = SimilarityQueries.q263SemanticRecall(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, t, c, e6) =>
      assert(c <= t && e6 <= 1000000L)
    }
    val byBand = rows.map { case (b, _, _, e6) => b -> e6 }.toMap
    // monotone where both bands exist: closer duplicates collide in
    // more LSH bands
    for {
      lo <- byBand.get("0.35-0.50"); hi <- byBand.get("0.70+")
    } assert(hi >= lo, s"recall must not fall with similarity: $byBand")
  }

  test("q264 Fano factor is non-negative and counts conserve") {
    val rows = TemporalQueries.q264Burstiness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, "Cauchy-Schwarz: var/mean cannot be negative")
      assert(r.getLong(1) >= 2L)
    }
    val total = graft.Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == total)
  }

  test("q265 datacard columns tie out against their source operators") {
    val rows = DedupQueries.q265CorpusDatacard(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1) && r.getLong(5) <= r.getLong(1) &&
        r.getLong(6) <= r.getLong(1))
    }
    val passTotal = QualityFilterQueries.q243SourcePrior(spark, sfDir)
      .collect().map(_.getLong(2)).sum
    assert(rows.map(_.getLong(4)).sum == passTotal,
      "rules-pass counts must equal q243's")
    val lexTotal = DedupQueries.q64Decontaminate(spark, sfDir).count()
    assert(rows.map(_.getLong(6)).sum == lexTotal,
      "contamination counts must equal q64's flagged docs")
  }

  test("q266 concentration ties out against q50's cluster listing") {
    val r = SimilarityQueries.q266DupConcentration(spark, sfDir).collect().head
    val sizes = SimilarityQueries.q50CcClusters(spark, sfDir)
      .collect().map(_.getLong(1)).sorted
    assert(r.getLong(0) == sizes.length)
    assert(r.getLong(1) == sizes.sum)
    assert(r.getLong(2) == sizes.max)
    // exact replay of the rank-sum Gini from the sorted sizes
    val n = BigInt(sizes.length)
    val s0 = sizes.map(BigInt(_)).sum
    val s1 = sizes.zipWithIndex.map { case (m, i) => BigInt(i + 1) * m }.sum
    val gini = math.floor(
      (2 * s1 - (n + 1) * s0).toDouble / (n * s0).toDouble * 1e6).toLong
    assert(r.getLong(3) == gini)
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
  }

  test("q247 streamed histogram quantiles equal a batch recomputation") {
    val streamed = graft.streaming.StreamingQueries
      .q247StreamingQuantiles(spark, sfDir).collect().toSeq
    assert(streamed.nonEmpty)
    streamed.foreach(r => assert(r.getLong(2) <= r.getLong(3), "p50 <= p95"))
    val W = org.apache.spark.sql.expressions.Window
    val maxTs = graft.Tables.events(spark, sfDir).agg(max("ts")).first()
      .getTimestamp(0).getTime
    val batch = graft.Tables.events(spark, sfDir)
      .select(expr("timestamp_micros((unix_micros(ts) div 86400000000) * 86400000000)")
        .as("wstart"),
        expr("least(511L, greatest(0L, cast(floor(value) as bigint)))").as("bin"))
      .filter(expr(s"unix_millis(wstart) + 90000000 <= $maxTs"))
      .groupBy(date_format(col("wstart"), "yyyy-MM-dd HH:mm:ss").as("w"), col("bin"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .withColumn("cum", sum("cnt").over(
        W.partitionBy("w").orderBy("bin").rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("n", sum("cnt").over(W.partitionBy("w")))
      .groupBy("w")
      .agg(max("n").cast("bigint").as("n_events"),
        min(when(expr("2 * cum >= n"), col("bin"))).cast("bigint").as("p50_bin"),
        min(when(expr("20 * cum >= 19 * n"), col("bin"))).cast("bigint").as("p95_bin"))
      .orderBy("w").collect().toSeq
    assert(streamed.map(_.toSeq) == batch.map(_.toSeq))
  }
}
