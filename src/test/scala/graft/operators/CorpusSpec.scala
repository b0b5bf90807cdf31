package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Behavior of the corpus-composition family (q64–q70) on synthetic
  * corpora where ground truth is known by construction, plus the
  * distributed-prefix-sum equivalence that justifies q68's shape. */
class CorpusSpec extends AnyFunSuite {
  import graft.SparkTestSession.{spark, sfDir}

  /** Write a documents.parquet with the given (doc_id, text) rows; n_chars
    * is derived so the fixture keeps the real table's invariant. */
  private def corpus(rows: Seq[(Long, String)], lang: Long => String = _ => "en"): String = {
    import spark.implicits._
    val dir = graft.Staging.fresh("corpus")
    rows.map { case (id, t) => (id, t, lang(id)) }
      .toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'synthetic' as source",
        "cast(length(text) as bigint) as n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q68: the two-phase distributed prefix sum is bit-identical to the naive global window") {
    val twoPhase = CorpusQueries.q68TokenPacking(spark, sfDir).collect()
    val naive = CorpusQueries.tokenPackingNaive(spark, sfDir).collect()
    assert(twoPhase.nonEmpty)
    assert(twoPhase.toSeq == naive.toSeq)
  }

  test("q68: documents straddling a bucket boundary land in the shard the global cumsum dictates") {
    // 5 docs of 2000 tokens each in one lang: a doc starts in the shard of
    // its PRECEDING token count (0, 2000, 4000, 6000, 8000), so with budget
    // 4096 the split is [0,0,0,1,1] — and the ids are spread across three
    // 64-wide id-buckets (0, 63..65, 128) to force non-trivial cross-bucket
    // offsets through the two-phase pass.
    val big = (1 to 2000).map(i => s"t$i").mkString(" ")
    val dir = corpus(Seq(0L, 63L, 64L, 65L, 128L).map(id => (id, big)))
    val out = CorpusQueries.q68TokenPacking(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 3L, 6000L), (1L, 2L, 4000L)))
  }

  test("q68: two-phase == naive on a randomized corpus (gapped ids, ragged lengths, many langs)") {
    val rnd = new scala.util.Random(42)
    val ids = scala.collection.mutable.SortedSet.empty[Long]
    while (ids.size < 300) ids += rnd.nextInt(100000).toLong
    val langs = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val rows = ids.toSeq.map { id =>
      (id, (1 to (1 + rnd.nextInt(200))).map(i => s"t$i").mkString(" "))
    }
    val dir = corpus(rows, lang = id => langs((id % langs.length).toInt))
    val twoPhase = CorpusQueries.q68TokenPacking(spark, dir).collect()
    val naive = CorpusQueries.tokenPackingNaive(spark, dir).collect()
    assert(twoPhase.nonEmpty && twoPhase.toSeq == naive.toSeq)
  }

  test("q64: a training doc that copies benchmark text is flagged; disjoint docs are not") {
    // id 74 is benchmark (74 % 37 == 0); 75 copies it, 76 is disjoint
    val leaked = "alpha beta gamma delta epsilon zeta"
    val dir = corpus(Seq(
      74L -> leaked,
      75L -> leaked,
      76L -> "uno dos tres cuatro cinco seis"))
    val out = DedupQueries.q64Decontaminate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.keySet == Set(75L))
    // 6 tokens -> 4 distinct 3-shingles, all shared
    assert(out(75L) == 4L)
  }

  test("decontaminate library form: broadcast bench gives the same answer with a broadcast plan") {
    val docs = graft.Tables.documents(spark, sfDir)
    val train = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 37 =!= 0)
    val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 37 === 0)
    val hinted = DedupQueries.decontaminate(train, bench) // default: broadcast
    val unhinted = DedupQueries.decontaminate(train, bench, broadcastBench = false)
    assert(hinted.collect().toSeq == unhinted.collect().toSeq)
    assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastExchange"))
  }

  test("incrementalDedup library form matches the fixture query on the same split") {
    val docs = graft.Tables.documents(spark, sfDir)
    val lib = DedupQueries.incrementalDedup(
      batch = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 7),
      corpus = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 7))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val fixture = DedupQueries.q65IncrementalDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(lib == fixture)
  }

  test("q65: exact copies, near copies, and fresh docs get the right verdicts") {
    // batch ids are % 10 == 7; corpus ids are everything else
    val base = "one two three four five six seven eight nine ten"
    val dir = corpus(Seq(
      1L -> base, // corpus original
      2L -> "completely different corpus text here now", // corpus noise
      7L -> base, // batch: byte-identical -> exact_dup
      17L -> ("one two three four five six seven eight nine eleven"), // near: same min-4 shingle fp? one tail token changed
      27L -> "fresh unseen batch document with novel tokens")) // keep
    val out = DedupQueries.q65IncrementalDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(7L) == "exact_dup")
    assert(out(27L) == "keep")
    // 17's verdict depends on whether its 4 smallest shingle-md5s survive
    // the one-token edit; assert it is NOT an exact dup either way
    assert(out(17L) != "exact_dup")
  }

  test("q65: whitespace-only variants are exact duplicates (normalization works)") {
    val dir = corpus(Seq(
      1L -> "spaced   out    text example",
      7L -> "spaced out text example"))
    val out = DedupQueries.q65IncrementalDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(7L) == "exact_dup")
  }

  test("q70: an extreme length outlier is gated out, the bulk survives") {
    val normal = (1 to 30).map(i => (i.toLong, "x" * (95 + i))) // ~100 chars
    val blob = Seq((99L, "y" * 100000)) // the concatenated-crawl blob
    val dir = corpus(normal ++ blob)
    val out = CorpusQueries.q70OutlierGate(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val (total, kept, maxKept) = out("en")
    assert(total == 31L)
    assert(kept == 30L)
    assert(maxKept < 1000L) // the 100k blob is gone
  }

  test("q69: quotas allocate at most the budget and follow the temperature ordering") {
    val rows = CorpusQueries.q69TemperatureMixture(spark, sfDir).collect()
    val quotas = rows.map(_.getLong(4))
    assert(quotas.sum <= 100000L)
    assert(quotas.sum > 95000L) // floor loses < 1 unit per language
    // sqrt flattens: the head language's share of the mix must be SMALLER
    // than its share of the raw corpus
    val nDocs = rows.map(_.getLong(1))
    val head = rows.maxBy(_.getLong(1))
    assert(head.getDouble(3) < head.getLong(1).toDouble / nDocs.sum)
  }

  test("q73: chunk boundaries — a 48-token doc is one chunk, 49 spills, 112 gives the 64/64/16 ladder") {
    def toksDoc(id: Long, n: Int) = (id, (1 to n).map(i => s"w$i").mkString(" "))
    val dir = corpus(Seq(toksDoc(1L, 48), toksDoc(2L, 49), toksDoc(3L, 112)))
    val out = TextAnalysisQueries.q73Chunking(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(out(1L) == Seq(48))
    assert(out(2L) == Seq(49, 1))
    assert(out(3L) == Seq(64, 64, 16))
  }

  test("q74: adjacent-pair counts match hand-counted BPE statistics") {
    val dir = corpus(Seq((1L, "ab ab abc"), (2L, "x bc")))
    val out = TextAnalysisQueries.q74BpeMerges(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // words: ab, ab, abc, bc (x is length-1, skipped)
    assert(out == Map("ab" -> 3L, "bc" -> 2L))
  }

  test("q72: the stream-stream interval join equals the batch interval join") {
    val streamed = graft.streaming.StreamingQueries.q72StreamStreamJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = graft.Tables.events(spark, sfDir)
    val c = ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .selectExpr("event_id as click_id", "user_id", "ts as cts")
    val p = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("event_id as purchase_id", "user_id as pu", "ts as pts")
    val batch = c.join(p, org.apache.spark.sql.functions.expr(
        "user_id = pu and pts >= cts and pts <= cts + interval 30 minutes"))
      .selectExpr("cast(user_id as bigint) as user_id", "cast(click_id as bigint) c",
        "cast(purchase_id as bigint) p", "unix_micros(pts) - unix_micros(cts) as g")
      .orderBy("user_id", "c", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.forall { case (_, _, _, g) => g >= 0 && g <= 1800000000L })
  }

  test("q75: common-token documents outscore rare-token documents") {
    // 9 docs of common filler + 1 doc of singleton tokens
    val filler = (1 to 9).map(i => (i.toLong, "the cat sat on the mat again and again"))
    val weird = Seq((99L, "zxqv wkjh pqrs tuvw xyzq mnbv cxza sdfg hjkl"))
    val dir = corpus(filler ++ weird)
    val out = CorpusQueries.q75UnigramQuality(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(out(1L) > out(99L) * 5,
      s"filler ${out(1L)} must dominate gibberish ${out(99L)}")
  }

  test("q76: per-language top tokens are the hand-counted ones") {
    val dir = corpus(
      Seq((1L, "aa aa aa bb bb cc"), (2L, "dd dd ee")),
      lang = id => if (id == 1L) "en" else "fr")
    val out = CorpusQueries.q76TopkPerLang(spark, dir)
      .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getString(2), r.getLong(3)))).toMap
    assert(out(("en", 1)) == ("aa", 3L))
    assert(out(("en", 2)) == ("bb", 2L))
    assert(out(("en", 3)) == ("cc", 1L))
    assert(out(("fr", 1)) == ("dd", 2L))
    assert(out(("fr", 2)) == ("ee", 1L))
  }

  test("q77: a weight-4 source appears four times as densely as a weight-1 source") {
    // fixture sources: sn % 4 == 3 -> w=4 (src3, src7, ...); sn % 4 == 0 -> w=1
    val rows = CorpusQueries.q77WeightedInterleave(spark, sfDir).collect()
    assert(rows.length == 60)
    val pos = rows.map(_.getLong(0))
    assert(pos.toSeq == pos.sorted.toSeq)
    // within any merged prefix, each source's count is rank-within-source,
    // so count(w=4 source) ~ 4 x count(w=1 source); the fixture has 5
    // sources of each weight class (src0..src19)
    val byW = rows.groupBy(_.getInt(3)).view.mapValues(_.length).toMap
    assert(byW.getOrElse(4, 0) > 0 && byW.getOrElse(4, 0) > 2 * byW.getOrElse(1, 0),
      s"weight-4 sources must dominate the prefix: $byW")
  }

  test("q81: the concentration curve is a dense-ranked monotone share ending at 1.0") {
    val rows = CorpusQueries.q81SourceConcentration(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val shares = rows.map(_.getDouble(4))
    assert(shares.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    assert(math.abs(shares.last - 1.0) < 1e-12)
    val tokens = rows.map(_.getLong(2))
    assert(tokens.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q82: the scorecard accounts for every document and token once") {
    val rows = CorpusQueries.q82SourceScorecard(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
    assert(rows.length == docs.select("source").distinct().count())
    assert(rows.map(_.getLong(1)).sum == docs.count())
    val totalTokens = docs
      .selectExpr("sum(cast(size(split(text, ' ')) as bigint)) t").collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalTokens)
  }

  test("q66/q67: relevance scores are positive and ranked descending") {
    val tfidf = CorpusQueries.q66Tfidf(spark, sfDir).collect()
    assert(tfidf.length == 20)
    val scores = tfidf.map(_.getDouble(4))
    assert(scores.forall(_ > 0))
    assert(scores.toSeq == scores.sortBy(-_).toSeq)
    val bm25 = CorpusQueries.q67Bm25(spark, sfDir).collect()
    assert(bm25.length == 15)
    val b = bm25.map(_.getDouble(1))
    assert(b.toSeq == b.sortBy(-_).toSeq)
  }

  test("q211 bigram score separates a predictable doc from a gibberish one") {
    import spark.implicits._
    // 20 copies of one repeated sentence (high-count transitions) + one
    // doc of 40 unique never-repeated tokens (every transition at the
    // smoothing floor) + filler
    val sentence = "the cat sat on the mat and the dog sat on the rug"
    val gibberish = (0 until 40).map(i => s"zq${i}x").mkString(" ")
    val rows = (0L until 20L).map(i => (i, sentence)) :+ (20L -> gibberish)
    val out = CorpusQueries.bigramQuality(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(0L) > 5 * out(20L),
      s"predictable ${out(0L)} must dominate gibberish ${out(20L)}")
    assert(out.values.forall(s => s > 0.0 && s <= 1.0))
  }

  test("q211 single-repeated-bigram corpus scores exactly the closed form") {
    import spark.implicits._
    // corpus = n copies of "a b": c2(a,b) = n, c1(a) = n, V = 2
    // p = (n+1)/(n+2); score = floor(p*1e12)/1e12 exactly
    val n = 7
    val rows = (0L until n.toLong).map(i => (i, "a b"))
    val out = CorpusQueries.bigramQuality(rows.toDF("doc_id", "text")).collect()
    val expect = math.floor((n + 1).toDouble / (n + 2).toDouble * 1e12) / 1e12
    out.foreach { r =>
      assert(r.getLong(1) === 1L)
      assert(r.getDouble(2) === expect)
    }
  }
}
