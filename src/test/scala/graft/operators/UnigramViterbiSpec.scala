package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** q318 unigram-LM Viterbi segmentation: geometry pinned on a corpus
  * constructed so the greedy maximal-munch walk is PROVABLY suboptimal —
  * the one behavior that separates the Viterbi decode from q292's greedy
  * family. Vocabulary arithmetic is worked out by hand below and the
  * assertions are exact.
  *
  * Construction: 15 trigram filler words ("eee".."sss") x100 pin 15 of
  * the 16 trigram slots and all 15 doubled bigrams; "bcd" x50 takes the
  * 16th trigram slot (51 with the probe's occurrence); "ab" x60 takes the
  * 16th bigram slot (61 beats bc=51/cd=51, which fall OUT). The probe
  * word "abcd" then segments greedily as [ab, c, d] (3 pieces — "abc"
  * missed the trigram cut at count 1, and after consuming "ab" neither
  * "cd" nor any trigram matches) but optimally as [a, bcd] (2 pieces):
  * total mass T = 4774 + 3061 + 1551 = 9386 (14 bits), so lp(a) =
  * lp(bcd) = lp(ab) = lp(c) = lp(d) = 1000*(6-14) = -8000 and lp(b) =
  * -7000, giving a+bcd = -16000 > ab+c+d = -24000 > a+b+c+d = -31000. */
class UnigramViterbiSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark

  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = graft.Staging.fresh("viterbi")
    rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' as lang", "source",
        "cast(length(text) as bigint) as n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def fixture(): String = {
    val fillers = "efghijklmnopqrs".map(c => s"$c$c$c")
    val fillText = (fillers.flatMap(w => Seq.fill(100)(w)) ++
      Seq.fill(60)("ab") ++ Seq.fill(50)("bcd")).mkString(" ")
    corpus(Seq((0L, fillText, "fill"), (1L, "abcd", "probe")))
  }

  test("q318: greedy takes [ab,c,d] on the probe word, Viterbi finds [a,bcd]") {
    val out = TextAnalysisQueries.q318UnigramViterbi(spark, fixture())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val probe = out.find(_._1 == "probe").get
    assert(probe === (("probe", 1L, 4L, 3L, 2L, -16000L, 3000000L, 2000000L)),
      "the probe row must carry greedy=3 / viterbi=2 / score=lp(a)+lp(bcd)")
    val fill = out.find(_._1 == "fill").get
    // every filler word is a single vocab piece under BOTH walks
    assert(fill._2 === 1610L && fill._4 === 1610L && fill._5 === 1610L,
      "on the filler source greedy and Viterbi agree at one piece per word")
  }

  test("q318: the Viterbi score is the max over segmentations (never below greedy's path score)") {
    // On the natural fixture the floor-log2 lattice makes maximal munch
    // optimal for most words, so pieces agree — but the SCORE column must
    // always be the maximizer's. Cross-check one source's totals against
    // a brute-force DP over its distinct words is the oracle's job; here
    // pin the degenerate single-character word (one piece, lp of its own
    // char) to guard the DP's boundary row.
    val dir = corpus(Seq((0L, "z z z zz", "tiny")))
    // words [z, z, z, zz] -> chars z: 3*1 + 1*2 = 5; bigrams: zz x1; no
    // trigrams. T = 5 + 1 = 6 (3 bits). lp(z) = 1000*(3-3) = 0,
    // lp(zz) = 1000*(1-3) = -2000. "z" -> 1 piece, score 0; "zz" ->
    // z+z = 0 beats zz = -2000: Viterbi takes MORE pieces than greedy
    // here, pinning that the objective is score, not piece count.
    val out = TextAnalysisQueries.q318UnigramViterbi(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(("tiny", 4L, 4L, 5L, 0L)),
      "4 words; greedy munches zz as one bigram piece (4 total), Viterbi " +
        "splits it into two zero-cost chars (5 total, score 0)")
  }

  test("q319: the hard-EM round counts exactly the Viterbi pieces and prunes the unused vocabulary") {
    // Same fixture as test 1. Viterbi segmentations: 15 fillers -> [ccc]
    // x100 each, "ab" -> [ab] x60, "bcd" -> [bcd] x50, "abcd" -> [a, bcd].
    // Usage mass U = 1500 + 60 + 51 + 1 = 1612 (11 bits). Everything the
    // optimal segmentations never touch — all 15 doubled bigrams, and
    // every character except 'a' — must come back pruned.
    val out = TextAnalysisQueries.q319UnigramEm(spark, fixture())
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5), r.getLong(6))).toMap
    assert(out.size === 51, "19 chars + 16 bigrams + 16 trigrams")
    assert(out(("bcd", 3)) === ((51L, -8000L, 51L, 0, -5000L)))
    assert(out(("eee", 3)) === ((100L, -7000L, 100L, 0, -4000L)))
    assert(out(("ab", 2)) === ((61L, -8000L, 60L, 0, -5000L)))
    assert(out(("a", 1)) === ((61L, -8000L, 1L, 0, -10000L)))
    assert(out(("b", 1)) === ((111L, -7000L, 0L, 1, 0L)),
      "'b' only ever appears inside winning multi-char pieces, so it prunes")
    assert(out(("ee", 2))._4 === 1, "doubled bigrams lose to their trigrams and prune")
    assert(out.values.count(_._4 == 0) === 18, "16 trigrams + ab + a survive")
    assert(out.values.map(_._3).sum === 1612L, "usage mass is the corpus's Viterbi piece total")
  }

  test("q320: re-decoding under the re-estimated scores keeps the optimal segmentations and concentrates mass") {
    // Same fixture. Round-2 scores (U = 1612, 11 bits): filler trigrams
    // usage 100 -> -4000; bcd 51 / ab 60 -> -5000; char a usage 1 and all
    // floor-1 chars -> -10000. Every word re-segments identically
    // (probe: a+bcd = -15000 still beats ab+c+d = -25000), so pieces and
    // fertility are unchanged while each source's score improves:
    // fill = 1500*(-4000) + 60*(-5000) + 50*(-5000) = -6550000 vs round
    // 0's 1500*(-7000) + 110*(-8000) = -11380000; probe -15000 vs -16000.
    val out = TextAnalysisQueries.q320UnigramEmEval(spark, fixture())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq === Seq(
      ("fill", 1610L, 1610L, 1610L, -11380000L, -6550000L, 1000000L, 1000000L),
      ("probe", 1L, 2L, 2L, -16000L, -15000L, 2000000L, 2000000L)))
  }

  test("q321: a gram that crosses the top-16 cut only via delta mass is cut correctly") {
    // Base (doc_id 0): 16 trigram fillers x100 pin the cut; "xyz" x84
    // sits at rank 17. Delta (doc_id 7): "xyz" x30 lifts it to 114 —
    // above every filler. A naive "stage only the kept vocabulary"
    // implementation would have dropped xyz's base count and missed the
    // crossing; the staged FULL gram table makes the merge lossless, so
    // xyz enters the vocabulary and the (cnt DESC, g ASC) cut evicts the
    // lexicographically last 100-count filler, "ppp".
    val fillers = "abcdefghijklmnop".map(c => s"$c$c$c")
    val base = (fillers.flatMap(w => Seq.fill(100)(w)) ++
      Seq.fill(84)("xyz")).mkString(" ")
    val dir = corpus(Seq((0L, base, "base"), (7L, "xyz " * 29 + "xyz", "delta")))
    val tri = TextAnalysisQueries.q321UnigramIncremental(spark, dir)
      .collect().filter(_.getInt(1) == 3)
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(tri.size === 16, "the trigram vocabulary keeps exactly 16 pieces")
    assert(tri("xyz") === 114L, "base 84 + delta 30, merged losslessly")
    assert(!tri.contains("ppp"), "the crossing evicts the last filler")
    assert(tri("aaa") === 100L)
  }

  test("q322: the stream-maintained gram table trains the same vocabulary as the batch paths") {
    import graft.SparkTestSession.sfDir
    val batch = TextAnalysisQueries.q321UnigramIncremental(spark, sfDir).collect()
    val stream = graft.streaming.StreamingQueries.q322StreamingGrams(spark, sfDir).collect()
    assert(stream.nonEmpty && stream.toSeq === batch.toSeq,
      "stream == incremental batch == (by q321's oracle) the full rebuild")
  }
}
