package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** In-Spark differential proofs for the serving/governance wave
  * (q293–q298), independent of the DuckDB oracle gate: MaxSim dominates
  * any single-subvector score, the MMR greedy's scores are provably
  * non-increasing, RRF obeys its algebraic bounds, the blocking audit's
  * counters obey their containment laws, and the cascade ranking is the
  * true argmin of its own cost model. */
class ServingWaveSpec extends AnyFunSuite {

  test("q293 MaxSim: 3 results per probe, ranked by exact integer score") {
    val rows = SimilarityQueries.q293LateInteraction(spark, sfDir).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size == 8)
    byProbe.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.sameElements(Array(1, 2, 3)))
      val byRank = rs.sortBy(_.getInt(2)).map(_.getLong(3))
      assert(byRank.sliding(2).forall(p => p(0) >= p(1)),
        "maxsim must be non-increasing in rank")
    }
    // MaxSim >= the full-vector dot only when every per-token max is the
    // diagonal; the always-true bound is MaxSim >= sum of diagonal dots
    // = the full 64-dim dot (each token's max >= its aligned token)
    val iv = graft.Tables.embeddings(spark, sfDir)
      .withColumn("iv", expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000.0d + 0.5d) as bigint))"))
      .select(col("vec_id"), col("iv"))
    val probes = iv.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("iv").as("pv"))
    val full = iv.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("fdot", expr(
        "aggregate(zip_with(pv, iv, (x, y) -> x * y), 0L, (a, x) -> a + x)"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("fdot"))
    val joined = SimilarityQueries.q293LateInteraction(spark, sfDir)
      .join(full, Seq("probe_id", "neighbor_id"))
      .select(col("maxsim_e6"), col("fdot")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(0) >= r.getLong(1),
      "MaxSim must dominate the aligned-token (full-vector) dot"))
  }

  test("q305 IVF-MaxSim scores agree with brute-force MaxSim on shared pairs") {
    val ivf = SimilarityQueries.q305IvfMaxsim(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"), col("maxsim_e6").as("ms_ivf"))
    val brute = SimilarityQueries.q293LateInteraction(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"), col("maxsim_e6").as("ms_bf"))
    val joined = ivf.join(brute, Seq("probe_id", "neighbor_id")).collect()
    // the two paths score the same grid; wherever both rank a pair, the
    // exact integer scores must be identical — and the comparison must
    // not pass vacuously on an empty intersection
    assert(joined.nonEmpty, "IVF and brute top-3 must share at least one pair")
    joined.foreach(r => assert(r.getLong(2) == r.getLong(3),
      s"pair (${r.getLong(0)}, ${r.getLong(1)}): IVF and brute scores must match"))
    val byProbe = SimilarityQueries.q305IvfMaxsim(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    byProbe.values.foreach { rs =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getInt(2)).map(_.getLong(3))
      assert(byRank.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("q294 MMR: 4 distinct picks per probe with non-increasing scores") {
    val rows = SimilarityQueries.q294MmrRerank(spark, sfDir).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size == 4)
    byProbe.foreach { case (p, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(Array(1, 2, 3, 4)))
      assert(rs.map(_.getLong(2)).distinct.length == 4,
        s"probe $p must select 4 distinct neighbors")
      val scores = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      // from step 2 on, the selected-set max only grows, so the greedy's
      // achieved score can never rise (step 1 is raw relevance on a
      // different scale: a NEGATIVE max-similarity makes step 2's
      // rel − maxsim legitimately exceed it)
      assert(scores.drop(1).sliding(2).forall(q => q(0) >= q(1)),
        s"probe $p: MMR scores must be non-increasing past step 1, got ${scores.mkString(",")}")
    }
  }

  test("q295 RRF: 5 per probe, bounded by the two-ranker algebra") {
    val rows = SimilarityQueries.q295RrfFusion(spark, sfDir).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size == 32)
    val hi = 100000000L / 61 * 2 // both ranks 1
    byProbe.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.sameElements(Array(1, 2, 3, 4, 5)))
      val byRank = rs.sortBy(_.getInt(2)).map(_.getLong(3))
      assert(byRank.sliding(2).forall(p => p(0) >= p(1)))
      assert(byRank.head <= hi && byRank.last > 0)
    }
  }

  test("q296 code-switching counters obey containment") {
    val rows = TextAnalysisQueries.q296CodeSwitching(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_mixed <= n_docs")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
  }

  test("q297 blocking audit: containment laws + exact-dup pairs always caught") {
    val r = DedupQueries.q297BlockingAudit(spark, sfDir).collect().head
    val (nDocs, nPossible, nCand, nTruth, nCaught) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nPossible == nDocs * (nDocs - 1) / 2)
    assert(nCand <= nPossible && nCaught <= nTruth && nCaught <= nCand)
    assert(r.getLong(5) <= 1000000L && r.getLong(6) <= 1000000L)
    // identical text => identical shingle set => identical minhash bands
    // AND 5-gram Jaccard 1.0: every exact-dup pair must appear in BOTH
    // the candidate set and the truth set, so completeness can never be
    // bled by exact duplicates
    val dups = graft.Tables.documents(spark, sfDir)
      .filter(expr("size(split(text, ' ')) >= 5"))
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L))).collect().head.getLong(0)
    assert(nCaught >= dups,
      s"caught=$nCaught must cover all $dups exact-dup pairs")
  }

  test("q272 trimmed mean: bucket-offset selection equals the rank definition") {
    val rows = SegmentationQueries.q272TrimmedMean(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent recomputation by brute rank (fixture-sized), per group
    val base = graft.Tables.events(spark, sfDir)
      .selectExpr("event_type", "cast(round(value * 100) as bigint) as v", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val vs = base(r.getString(0)).sortBy(x => (x._2, x._3)).map(_._2)
      val n = vs.length; val t = n / 10
      val trimmed = vs.slice(t, n - t)
      assert(r.getLong(1) == n && r.getLong(2) == t)
      assert(r.getLong(4) == 1000000L * trimmed.sum / trimmed.length,
        s"${r.getString(0)}: trimmed mean must equal the rank-definition replay")
    }
  }

  test("q299 bootstrap: lo <= hi, every source present") {
    val rows = CorpusQueries.q299PoissonBootstrap(spark, sfDir).collect()
    val nSources = graft.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(rows.length == nSources)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4),
        s"${r.getString(0)}: boot_lo must be <= boot_hi")
      assert(r.getLong(1) > 0)
    }
  }

  test("q300 dedup shift: survivor counts and means replay exactly") {
    val rows = DedupQueries.q300DedupShift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalPost = rows.map(_.getLong(2)).sum
    // q21's exact fingerprint (lower + trim + whitespace collapse)
    val distinctTexts = graft.Tables.documents(spark, sfDir)
      .selectExpr("md5(lower(trim(regexp_replace(text, '\\\\s+', ' '))))")
      .distinct().count()
    assert(totalPost == distinctTexts,
      "survivors across sources must equal distinct q21 fingerprints")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_post <= n_pre")
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3), "shift = post - pre")
    }
  }

  test("q301 cluster keywords: 5 ranked keywords per cluster, scores ordered") {
    val rows = SimilarityQueries.q301ClusterKeywords(spark, sfDir).collect()
    val byLabel = rows.groupBy(_.getInt(0))
    assert(byLabel.nonEmpty)
    byLabel.foreach { case (l, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(Array(1, 2, 3, 4, 5)))
      assert(rs.map(_.getString(2)).distinct.length == 5,
        s"label $l: keywords must be distinct")
      val scores = rs.sortBy(_.getInt(1)).map(_.getLong(5))
      assert(scores.sliding(2).forall(p => p(0) >= p(1)))
      rs.foreach(r => assert(r.getLong(4) <= byLabel.size,
        "a token's cluster df cannot exceed the cluster count"))
    }
  }

  test("q302 label propagation: node conservation and seed accounting") {
    val rows = SimilarityQueries.q302LabelPropagation(spark, sfDir).collect()
    val nVecs = graft.Tables.embeddings(spark, sfDir).count()
    val nSeeds = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 100).count()
    assert(rows.map(_.getLong(4)).sum == nVecs,
      "labeled + unreached must conserve every node")
    assert(rows.map(_.getLong(1)).sum == nSeeds)
    assert(rows.exists(_.getLong(0) == -1L), "the unreached row must exist")
    rows.filter(_.getLong(0) >= 0).foreach { r =>
      assert(r.getLong(4) == r.getLong(1) + r.getLong(2) + r.getLong(3))
    }
  }

  test("q303 worst window: in-range spans, one row per eligible document") {
    val rows = CorpusQueries.q303WorstWindow(spark, sfDir).collect()
    // 16 tokens = 15 bigrams = exactly one valid window, so >= 16 is the
    // true eligibility bar
    val eligible = graft.Tables.documents(spark, sfDir)
      .filter(expr("size(split(text, ' ')) >= 16")).count()
    assert(rows.length == eligible, "one worst window per eligible document")
    rows.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) + 14 <= r.getLong(1),
        s"doc ${r.getLong(0)}: window [${r.getInt(2)}, +14] must fit in ${r.getLong(1)} bigrams")
      assert(r.getLong(3) > 0, "e12 mass of 15 smoothed transitions is strictly positive")
    }
  }

  test("q304 normalization recall: normalization recovers what raw case-noise destroys") {
    val rows = DedupQueries.q304NormalizationRecall(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, norm, full) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw <= 1000000L && norm <= 1000000L && full <= 1000000L)
      // mean agreement dominates the full-recovery share (agreement/12 >= P(=12))
      assert(norm >= full, s"${r.getString(0)}: mean agreement must dominate full share")
      // fixture-tied separation: uppercasing flips every shingle hash, so
      // raw agreement collapses while the normalized copy recovers
      assert(norm > raw, s"${r.getString(0)}: normalization must recover agreement")
    }
  }

  test("q306 augmentation: conservation bounds and no-empty-doc guarantee") {
    val rows = CorpusQueries.q306AugmentationAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, tin, tout) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tout <= tin && tout >= nDocs,
        s"${r.getString(0)}: kept tokens bounded by input, >= 1 per doc (position 1 survives)")
      assert(r.getLong(4) < 1000000L, "drop rate strictly below 100%")
      assert(r.getLong(5) <= nDocs, "distinct augmented texts bounded by docs")
      assert(r.getLong(6) <= nDocs, "global collisions bounded by docs")
    }
  }

  test("q298 cascade: rank 1 is the argmin of the replayed cost model") {
    val rows = QualityFilterQueries.q298CascadeOrdering(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(0)).distinct.length == 6)
    val byRank = rows.sortBy(_.getInt(2)).map(_.getLong(1))
    assert(byRank.sliding(2).forall(p => p(0) <= p(1)),
      "rows_examined must be non-decreasing in rank")
    // cost bounds: every ordering evaluates gate 1 on all N rows and at
    // most 3 gates per row
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(byRank.head >= n && byRank.last <= 3 * n)
  }
}
