package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** Differential proofs for the round-13 curation additions, independent
  * of the DuckDB oracle gate: q273's normalization counters replay from
  * a driver-side reimplementation of the rule chain (and the chain is
  * honestly idempotent), and q274's schedule follows the independently
  * recomputed salted-shuffle order with exact bucket accounting. */
class CurationWaveSpec extends AnyFunSuite {

  private def stageDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val s2 = spark
    import s2.implicits._
    val dir = graft.Staging.fresh("curation")
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The q273 chain replayed in plain JVM string ops. */
  private def normChain(raw: String): Seq[String] = {
    val s1 = raw.toLowerCase
    val s2 = s1.replace("\t", " ")
    val s3 = s2.replaceAll("[!]+", "!")
    val s4 = s3.replaceAll("  +", " ").trim
    Seq(s1, s2, s3, s4)
  }

  private def noisy(docId: Long, text: String): String =
    s"$text Mixed${docId % 5}CASE  " + "!" * (1 + (docId % 3)).toInt +
      s" end\ttab"

  test("q273 counters replay from a JVM reimplementation of the chain") {
    // doc 3: '!' run of length 1 -> the punct rule must NOT count it;
    // doc 4: '!!' -> counted. Both change case/ctrl/ws.
    val docs = Seq((3L, "hello world", "en", "s", 11L),
                   (4L, "a b  c", "en", "s", 6L),
                   (5L, "plain text here", "en", "t", 15L))
    val dir = stageDocs(docs)
    val expect = docs.groupBy(_._4).map { case (src, xs) =>
      val raws = xs.map(d => noisy(d._1, d._2))
      val chains = raws.map(r => r +: normChain(r))
      src -> (xs.size.toLong,
        chains.count(c => c(1) != c(0)).toLong,
        chains.count(c => c(2) != c(1)).toLong,
        chains.count(c => c(3) != c(2)).toLong,
        chains.count(c => c(4) != c(3)).toLong,
        raws.map(_.length.toLong).sum,
        chains.map(_.last.length.toLong).sum,
        0L)
    }
    val got = TextAnalysisQueries.q273NormalizationAudit(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_case"),
          r.getAs[Long]("n_ctrl"), r.getAs[Long]("n_punct"),
          r.getAs[Long]("n_ws"), r.getAs[Long]("chars_in"),
          r.getAs[Long]("chars_out"), r.getAs[Long]("n_non_idem"))).toMap
    assert(got == expect)
    // the doc-3 source saw one single-'!' doc and one '!!' doc
    assert(got("s")._4 == 1L)
  }

  test("q273 is idempotent on the sf fixture and conserves char mass") {
    val rows = TextAnalysisQueries.q273NormalizationAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_non_idem") == 0L)
      assert(r.getAs[Long]("chars_out") <= r.getAs[Long]("chars_in"))
      Seq("n_case", "n_ctrl", "n_punct", "n_ws").foreach(c =>
        assert(r.getAs[Long](c) <= r.getAs[Long]("n_docs")))
      // every doc gets a tab and a double space injected
      assert(r.getAs[Long]("n_ctrl") == r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_ws") == r.getAs[Long]("n_docs"))
    }
  }

  /** The q274 shuffle key replayed: first 8 md5 hex digits of the
    * salted doc id. */
  private def shufKey(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"curr_$docId".getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("q274 schedule follows the recomputed shuffle order per bucket") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        val toks = r.getAs[String]("text").split(" ", -1)
        val n = math.max(toks.length, 1)
        val b = if (n < 30) 0 else if (n < 60) 1 else if (n < 90) 2 else 3
        (b, r.getAs[Long]("doc_id"), n.toLong,
          1000L * toks.distinct.length / n + n)
      }
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (b, xs) =>
      xs.sortBy(d => (shufKey(d._2), d._2)).take(6).zipWithIndex.map {
        case ((_, id, n, diff), i) =>
          (b, i + 1L, id, n, diff, xs.length.toLong)
      }
    }.sortBy(x => (x._1, x._2))
    val got = CorpusQueries
      .q274CurriculumSchedule(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("sched_rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("difficulty"), r.getAs[Long]("bucket_docs"))).toSeq
    assert(got == expect && got.nonEmpty)
    // bucket populations cover the whole corpus exactly once
    assert(got.map(x => (x._1, x._6)).distinct.map(_._2).sum == docs.length)
  }
}
