package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** Constructed-fixture and brute-force-replay proofs for the round-13
  * second wave: q279's t-closeness distances are the exact hand-computed
  * total-variation values, q280's opt-out closure quarantines exactly
  * the constructed cluster, q281's modularity cells match the
  * hand-counted two-community graph, q282's centroid-fit margins land on
  * the exact lattice values (including the singleton −2 pin), q283's
  * Zipf buckets partition a hand-built token mass, and q284's split
  * repair replays from a per-document brute force. All independent of
  * the DuckDB oracle gate. */
class GovernanceFitSpec extends AnyFunSuite {

  private def stageDocs(dir: String,
      rows: Seq[(Long, String, String, String, Long)]): Unit = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def stageEmb(dir: String,
      rows: Seq[(Long, Array[Float], Int)]): Unit = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** 64-dim unit basis vector along axis d. */
  private def axis(d: Int): Array[Float] = {
    val a = new Array[Float](64); a(d) = 1.0f; a
  }

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The suite's salted 4-nibble md5 integer (q88/q280/q284 draw). */
  private def md5int4(x: String): Long =
    java.lang.Long.parseLong(md5hex(x).substring(0, 4), 16)

  private def words(n: Int): String = Seq.fill(n)("tok").mkString(" ")

  test("q279 t-closeness pins the hand-computed TV distances") {
    // en class (1,2): 3 srcA + 3 srcB — matches the global half/half
    // mix exactly -> tv 0. de classes (0,1) all-srcA and (2,3)
    // all-srcB -> tv = 36e6/(2*3*12) = 500000 each, both over t=0.4.
    val dir = graft.Staging.fresh("govfit279")
    stageDocs(dir,
      (1L to 3L).map(i => (i, words(25), "en", "srcA", 150L)) ++
      (4L to 6L).map(i => (i, words(25), "en", "srcB", 150L)) ++
      (7L to 9L).map(i => (i, words(12), "de", "srcA", 50L)) ++
      (10L to 12L).map(i => (i, words(31), "de", "srcB", 250L)))
    val got = CorpusQueries.q279TCloseness(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_classes"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("max_tv_e6"), r.getAs[Long]("n_classes_over"),
          r.getAs[Long]("n_docs_at_risk"), r.getAs[Long]("risk_share_e6")))
      .toMap
    assert(got("en") == ((1L, 6L, 0L, 0L, 0L, 0L)))
    assert(got("de") == ((2L, 6L, 500000L, 2L, 6L, 1000000L)))
  }

  test("q279 replays from a brute-force class/source census") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        val cls = (r.getAs[String]("lang"), r.getAs[Long]("n_chars") / 100,
          r.getAs[String]("text").split(" ", -1).length.toLong / 10)
        (cls, r.getAs[String]("source"))
      }
    val n = docs.length.toLong
    val bySrc = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val perClass = docs.groupBy(_._1).map { case (cls, xs) =>
      val nc = xs.length.toLong
      val present = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val sa = present.map { case (src, ncs) =>
        math.abs(ncs * n - bySrc(src) * nc) }.sum
      val sp = present.keysIterator.map(bySrc).sum // iterator: equal counts must not collapse
      val tv = (1000000L * (sa + nc * (n - sp))) / (2 * nc * n)
      (cls._1, nc, tv)
    }
    val expect = perClass.groupBy(_._1).map { case (lang, xs) =>
      lang -> (xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).max,
        xs.count(_._3 > 400000L).toLong,
        xs.filter(_._3 > 400000L).map(_._2).sum)
    }
    val got = CorpusQueries.q279TCloseness(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_classes"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("max_tv_e6"), r.getAs[Long]("n_classes_over"),
          r.getAs[Long]("n_docs_at_risk"))).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("q280 quarantines exactly the constructed opt-out cluster") {
    // find deterministic opt-out ids under the 'opt_' draw, and clean ids
    val ids = (0L to 400L)
    def isOpt(i: Long) = md5int4(s"opt_$i") % 50 == 0
    val opt1 :: opt2 :: Nil = ids.filter(isOpt).take(2).toList
    val clean = ids.filterNot(isOpt).take(3).toList
    val (a, b, c) = (clean(0), clean(1), clean(2))
    // cluster {opt1, a, b} via identical vectors; c and opt2 singletons
    val dir = graft.Staging.fresh("govfit280")
    stageEmb(dir, Seq((opt1, axis(0), 0), (a, axis(0), 0), (b, axis(0), 0),
      (c, axis(1), 0), (opt2, axis(2), 0)))
    stageDocs(dir, Seq(
      (opt1, "x", "en", "sA", 10L), (a, "x", "en", "sA", 10L),
      (b, "x", "en", "sB", 10L), (c, "x", "en", "sB", 10L),
      (opt2, "x", "en", "sC", 10L)))
    val got = SimilarityQueries.q280OptoutClosure(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_optout"),
          r.getAs[Long]("n_quarantined"), r.getAs[Long]("n_collateral"),
          r.getAs[Long]("quar_share_e6"))).toMap
    assert(got("sA") == ((2L, 1L, 2L, 1L, 1000000L)))
    assert(got("sB") == ((2L, 0L, 1L, 1L, 500000L)))
    assert(got("sC") == ((1L, 1L, 1L, 0L, 1000000L)))
  }

  test("q280 fixture invariants: opt-outs are quarantined, collateral non-negative") {
    val rows = SimilarityQueries.q280OptoutClosure(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_quarantined") >= r.getAs[Long]("n_optout"))
      assert(r.getAs[Long]("n_collateral") ==
        r.getAs[Long]("n_quarantined") - r.getAs[Long]("n_optout"))
      assert(r.getAs[Long]("n_quarantined") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q281 modularity cells match the hand-counted two-community graph") {
    // label 0 = {0,1,2} identical, label 1 = {3,4} identical, orthogonal
    // across labels: m=4, d0=6 e0=3, d1=2 e1=1
    val dir = graft.Staging.fresh("govfit281")
    stageEmb(dir, Seq((0L, axis(0), 0), (1L, axis(0), 0), (2L, axis(0), 0),
      (3L, axis(1), 1), (4L, axis(1), 1)))
    val got = SimilarityQueries.q281Modularity(spark, dir).collect()
      .map(r => r.getAs[Int]("lbl") ->
        (r.getAs[Long]("d_c"), r.getAs[Long]("e_c"),
          r.getAs[Long]("frac_e6"), r.getAs[Long]("exp_e6"),
          r.getAs[Long]("dq_e6"))).toMap
    assert(got(0) == ((6L, 3L, 750000L, 562500L, 187500L)))
    assert(got(1) == ((2L, 1L, 250000L, 62500L, 187500L)))
  }

  test("q281 taxonomy-drift: a label duplicating another's content goes negative") {
    // label 1's only member shares label 0's vector: every edge is
    // cross or intra-0; label 1 has degree mass but zero intra edges
    val dir = graft.Staging.fresh("govfit281b")
    stageEmb(dir, Seq((0L, axis(0), 0), (1L, axis(0), 0), (2L, axis(0), 0),
      (3L, axis(0), 1)))
    val got = SimilarityQueries.q281Modularity(spark, dir).collect()
      .map(r => r.getAs[Int]("lbl") ->
        (r.getAs[Long]("d_c"), r.getAs[Long]("e_c"),
          r.getAs[Long]("dq_e6"))).toMap
    // m=6; label0: d=9, e=3 -> dq = floor((72-81)/144*1e6) = -62500
    assert(got(0) == ((9L, 3L, -62500L)))
    assert(got(1) == ((3L, 0L, -62500L)))
  }

  test("q282 centroid-fit margins land on the exact lattice") {
    // two pure orthogonal labels + a singleton label: pure members get
    // cos_own=1, best_other=0, margin 1e6; the singleton pins -2
    val dir = graft.Staging.fresh("govfit282")
    stageEmb(dir, Seq((0L, axis(0), 0), (1L, axis(0), 0), (2L, axis(0), 0),
      (3L, axis(1), 1), (4L, axis(1), 1), (5L, axis(2), 2)))
    val got = SimilarityQueries.q282CentroidFit(spark, dir).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_misfit"),
          r.getAs[Long]("misfit_share_e6"), r.getAs[Long]("margin_sum_e6")))
      .toMap
    assert(got(0) == ((3L, 0L, 0L, 3000000L)))
    assert(got(1) == ((2L, 0L, 0L, 2000000L)))
    assert(got(2) == ((1L, 1L, 1000000L, -2000000L)))
  }

  test("q282 fixture invariants: counts, shares, margin bounds") {
    val rows = SimilarityQueries.q282CentroidFit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nv = rows.map(_.getAs[Long]("n_vecs")).sum
    val total = graft.Tables.embeddings(spark, sfDir).count()
    assert(nv == total)
    rows.foreach { r =>
      val (n, mis) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_misfit"))
      assert(mis >= 0 && mis <= n)
      assert(r.getAs[Long]("misfit_share_e6") == 1000000L * mis / n)
      // every margin sits in [-2e6, 2e6] (cosines in [-1,1], pin -2)
      val ms = r.getAs[Long]("margin_sum_e6")
      assert(ms >= -2000000L * n && ms <= 2000000L * n)
    }
  }

  test("q283 Zipf buckets partition a hand-built token mass") {
    // counts a:8 b:4 c:2 d:1 e:1 -> ranks 1..5, buckets 1/2/3 with
    // masses 8/6/2 of 16
    val dir = graft.Staging.fresh("govfit283")
    stageDocs(dir, Seq(
      (1L, "a a a a a a a a b b b b c c d e", "en", "s", 31L)))
    val got = TextAnalysisQueries.q283ZipfProfile(spark, dir).collect()
      .map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("n_ranks"), r.getAs[Long]("mass"),
          r.getAs[Long]("share_e6"), r.getAs[Long]("cum_share_e6"))).toMap
    assert(got(1) == ((1L, 8L, 500000L, 500000L)))
    assert(got(2) == ((2L, 6L, 375000L, 875000L)))
    assert(got(3) == ((2L, 2L, 125000L, 1000000L)))
  }

  test("q283 fixture invariants: doubling-bucket geometry and closure") {
    val rows = TextAnalysisQueries.q283ZipfProfile(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("n_ranks"),
        r.getAs[Long]("mass"), r.getAs[Long]("cum_share_e6")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // bucket k holds at most 2^(k-1) ranks, and exactly that when full
    rows.init.zipWithIndex.foreach { case ((b, nr, _, _), i) =>
      assert(nr == (1L << (b - 1)), s"bucket $b")
      assert(b == rows(0)._1 + i) // contiguous buckets
    }
    assert(rows.last._2 <= (1L << (rows.last._1 - 1)))
    assert(rows.last._4 == 1000000L)
    // total mass equals the token count of the corpus
    val toks = graft.Tables.documents(spark, sfDir)
      .selectExpr("sum(size(split(text, ' ')))").collect()(0).getLong(0)
    assert(rows.map(_._3).sum == toks)
  }

  test("q285 agreement pins constructed lexical-identical vs token-far pairs") {
    // pair (0,1): same vector, same words -> lexical agree at both bars;
    // pair (2,3): same vector, disjoint words -> disagree; 4 singleton
    val dir = graft.Staging.fresh("govfit285")
    stageEmb(dir, Seq((0L, axis(0), 0), (1L, axis(0), 0),
      (2L, axis(1), 0), (3L, axis(1), 0), (4L, axis(2), 0)))
    stageDocs(dir, Seq(
      (0L, "x y z", "en", "s", 5L), (1L, "x y z", "en", "s", 5L),
      (2L, "a b c", "en", "s", 5L), (3L, "d e f", "en", "s", 5L),
      (4L, "q r s", "en", "s", 5L)))
    val got = SimilarityQueries.q285DedupAgreement(spark, dir).collect()
      .map(r => r.getAs[String]("cos_band") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_lex_05"),
          r.getAs[Long]("n_lex_03"), r.getAs[Long]("agree05_e6"))).toMap
    assert(got == Map("0.70+" -> ((2L, 1L, 1L, 500000L))))
  }

  test("q285 fixture invariants: soft bar dominates, shares consistent") {
    val rows = SimilarityQueries.q285DedupAgreement(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, l5, l3) = (r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_lex_05"), r.getAs[Long]("n_lex_03"))
      assert(l3 >= l5 && n >= l3)
      assert(r.getAs[Long]("agree05_e6") == 1000000L * l5 / n)
      assert(r.getAs[Long]("agree03_e6") == 1000000L * l3 / n)
    }
  }

  test("q286 MW ladder replays from q215's gate and renormalizes") {
    val gate = QualityFilterQueries.q215RulesGate(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pass"))).toMap
    val rows = QualityFilterQueries.q286MixtureReweight(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length == gate.size)
    val bigN = gate.values.map(_._1).sum
    val w3s = rows.map { r =>
      val src = r.getAs[String]("source")
      val (nd, np) = gate(src)
      val fail = 1000000L * (nd - np) / nd
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("fail_e6") == fail)
      assert(r.getAs[Long]("nat_share_e6") == 1000000L * nd / bigN)
      val w1 = 1000000L + fail
      val w2 = w1 * (1000000L + fail) / 1000000L
      val w3 = w2 * (1000000L + fail) / 1000000L
      assert(r.getAs[Long]("w1_e6") == w1 && r.getAs[Long]("w2_e6") == w2 &&
        r.getAs[Long]("w3_e6") == w3)
      (r.getAs[Long]("fail_e6"), w3, r.getAs[Long]("share_e6"))
    }
    val tw = w3s.map(_._2).sum
    rows.zip(w3s).foreach { case (r, (_, w3, sh)) =>
      assert(sh == 1000000L * w3 / tw)
    }
    // floored shares close under the source count; lossier domains never
    // get a smaller weight
    val shareSum = w3s.map(_._3).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
    w3s.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._2)
      case _ =>
    }
  }

  test("q287 EWMA replays exactly on a constructed spike series") {
    // 25 days at 4/day; 3x spikes at day 10 (pre-warmup: must NOT flag)
    // and day 22 (post-warmup: must flag)
    val s2 = spark
    import s2.implicits._
    val dir = graft.Staging.fresh("govfit287")
    val counts = (0 until 25).map(i => if (i == 10 || i == 22) 12L else 4L)
    val rows = for {
      i <- 0 until 25
      j <- 1L to counts(i)
    } yield ("rent", java.sql.Timestamp.valueOf(f"2026-01-${i + 1}%02d 12:00:00"), j)
    rows.toDF("event_type", "ts", "n").drop("n")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val expect = (0 until 25).map { i =>
      val prior = (1 to 20).filter(_ <= i)
        .map(k => counts(i - k) * (1L << (20 - k))).sum
      val spike = if (i >= 20 && counts(i) * 1048576L > 2 * prior) 1 else 0
      java.sql.Date.valueOf(f"2026-01-${i + 1}%02d") ->
        ((counts(i), 1000L * prior / 1048576L, spike))
    }.toMap
    val got = TemporalQueries.q287EwmaTrend(spark, dir).collect()
      .map(r => r.getAs[java.sql.Date]("d") ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("ewma_milli"),
          r.getAs[Int]("spike")))).toMap
    assert(got == expect)
    assert(got(java.sql.Date.valueOf("2026-01-23"))._3 == 1) // day 22 flags
    assert(got(java.sql.Date.valueOf("2026-01-11"))._3 == 0) // day 10 gated
  }

  test("q288 effective mass attributes each cluster once, to its rep's source") {
    // cluster {0,1,2,5}: rep 0 (sA); 2 (sB) and 5 (sC) are members;
    // 3 (sB) unclustered. sC holds only a non-rep member -> effective 0
    val dir = graft.Staging.fresh("govfit288")
    stageEmb(dir, Seq((0L, axis(0), 0), (1L, axis(0), 0), (2L, axis(0), 0),
      (5L, axis(0), 0), (3L, axis(1), 0)))
    stageDocs(dir, Seq(
      (0L, "t1 t2", "en", "sA", 5L), (1L, "t1 t2", "en", "sA", 5L),
      (2L, "t1 t2", "en", "sB", 5L), (3L, "t1 t2", "en", "sB", 5L),
      (5L, "t1 t2", "en", "sC", 5L)))
    val got = SimilarityQueries.q288EffectiveMass(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens"),
          r.getAs[Long]("n_eff"), r.getAs[Long]("tokens_eff"),
          r.getAs[Long]("inflation_e6"))).toMap
    assert(got("sA") == ((2L, 4L, 1L, 2L, 2000000L)))
    assert(got("sB") == ((2L, 4L, 1L, 2L, 2000000L)))
    assert(got("sC") == ((1L, 2L, 0L, 0L, 2000000L))) // guarded denominator
  }

  test("q289 affinity separates the constructed cross-lingual pair") {
    val dir = graft.Staging.fresh("govfit289")
    stageEmb(dir, Seq((0L, axis(0), 0), (1L, axis(0), 0),
      (2L, axis(1), 0), (3L, axis(1), 0)))
    stageDocs(dir, Seq(
      (0L, "x", "en", "s", 1L), (1L, "x", "de", "s", 1L),
      (2L, "x", "en", "s", 1L), (3L, "x", "en", "s", 1L)))
    val got = SimilarityQueries.q289CrosslingualPairs(spark, dir).collect()
      .map(r => (r.getAs[String]("lang_a"), r.getAs[String]("lang_b")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_strong"),
          r.getAs[Long]("share_e6"))).toMap
    assert(got == Map(
      ("de", "en") -> ((1L, 1L, 500000L)),
      ("en", "en") -> ((1L, 1L, 500000L))))
  }

  test("q290 template census pins constructed template families") {
    val dir = graft.Staging.fresh("govfit290")
    stageDocs(dir, Seq(
      (1L, "alpha beta gamma delta tail1 tail2", "en", "s1", 30L),
      (2L, "alpha beta gamma delta other", "de", "s2", 25L),
      (3L, "solo first four words xyz", "en", "s1", 20L),
      (4L, "tmpl two three four", "en", "s1", 19L),
      (5L, "tmpl two three four", "en", "s1", 19L)))
    val rows = TextAnalysisQueries.q290TemplateCensus(spark, dir).collect()
      .map(r => r.getAs[String]("template_key") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"),
          r.getAs[Long]("n_langs"), r.getAs[Long]("tokens")))
    assert(rows.length == 2) // the singleton prefix never surfaces
    assert(rows.toMap == Map(
      "alpha beta gamma delta" -> ((2L, 2L, 2L, 11L)),
      "tmpl two three four" -> ((2L, 1L, 1L, 8L))))
    // tie on n_docs breaks by key ascending
    assert(rows.head._1 == "alpha beta gamma delta")
  }

  test("q291 ablation isolates single-rule failures exactly") {
    def distinctWords(n: Int, tag: String): Seq[String] =
      (0 until n).map(i => f"$tag%s${i}%02d") // 5-char words: tag(3)+2
    // pass-all: 'the' + 29 distinct 5-char words (n=30, avg len 49/10)
    val passDoc = ("the" +: distinctWords(29, "wrd")).mkString(" ")
    // fails ONLY wordcount: same shape at n=20
    val shortDoc = ("the" +: distinctWords(19, "wrd")).mkString(" ")
    // fails ONLY stopword: 30 distinct 5-char words, no stop token
    val noStopDoc = distinctWords(30, "xyz").mkString(" ")
    val dir = graft.Staging.fresh("govfit291")
    stageDocs(dir, Seq(
      (1L, passDoc, "en", "sA", 100L),
      (2L, shortDoc, "en", "sA", 100L),
      (3L, noStopDoc, "en", "sA", 100L)))
    val got = QualityFilterQueries.q291GateAblation(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pass"),
          r.getAs[Long]("m_wordcount"), r.getAs[Long]("m_wordlen"),
          r.getAs[Long]("m_stopword"), r.getAs[Long]("m_repetition"),
          r.getAs[Long]("m_topshare"))).toMap
    assert(got("sA") == ((3L, 1L, 1L, 0L, 1L, 0L, 0L)))
  }

  test("q291 marginals agree with q215 on the fixture corpus") {
    val gate = QualityFilterQueries.q215RulesGate(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pass"))).toMap
    val rows = QualityFilterQueries.q291GateAblation(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length == gate.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_pass")) == gate(src))
      // removing a rule can only release documents, never block more
      Seq("m_wordcount", "m_wordlen", "m_stopword", "m_repetition",
        "m_topshare").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && r.getAs[Long]("n_pass") + v <= r.getAs[Long]("n_docs"))
      }
    }
  }

  test("q284 split repair replays from a per-document brute force") {
    val sf = "/root/testdata/sf0.001"
    def split(i: Long): String = {
      val b = md5int4(s"split_$i") % 100
      if (b < 90) "train" else if (b < 95) "valid" else "test"
    }
    val lbls = SimilarityQueries.ccLabels(spark, sf).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("lbl")).toMap
    val ids = graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val moves = ids.map { i =>
      val before = split(i)
      val after = lbls.get(i).map(split).getOrElse(before)
      (before, after)
    }
    val reps = lbls.values.toSet.toSeq.map((l: Long) => split(l))
    val expect = moves.map(_._1).distinct.sorted.map { sp =>
      sp -> (moves.count(_._1 == sp).toLong,
        moves.count(_._2 == sp).toLong,
        moves.count(m => m._2 == sp && m._1 != m._2).toLong,
        moves.count(m => m._1 == sp && m._1 != m._2).toLong,
        reps.count(_ == sp).toLong)
    }.toMap
    val got = CorpusQueries.q284SplitRepair(spark, sf).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"),
          r.getAs[Long]("n_moved_in"), r.getAs[Long]("n_moved_out"),
          r.getAs[Long]("n_clusters"))).toMap
    assert(got == expect && got.nonEmpty)
    // conservation: the repair permutes docs, never creates or drops
    assert(got.values.map(_._1).sum == got.values.map(_._2).sum)
    assert(got.values.map(_._3).sum == got.values.map(_._4).sum)
  }
}
