package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** Constructed-fixture proofs for the round-13 wave: q269's
  * k-anonymity audit counts exactly the documents whose global
  * quasi-identifier class is smaller than k, q271's l-diversity audit
  * flags exactly the single-source classes, q275's generalization
  * ladder merges a constructed violation away at the predicted level
  * (and is monotone in level on the fixture), q270's content-extraction
  * gate classifies a hand-built boilerplate/content page block by
  * block. All independent of the DuckDB oracle gate. */
class PrivacyContentSpec extends AnyFunSuite {

  /** Stage a documents.parquet with the fixture schema. */
  private def stageDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val s2 = spark
    import s2.implicits._
    val dir = graft.Staging.fresh("privcontent")
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(n: Int): String = Seq.fill(n)("tok").mkString(" ")

  test("q269 pins a constructed k-violation exactly") {
    // class X (en, len_b 1, wc_b 2): 6 docs across both sources -> safe
    // class Y (de, len_b 0, wc_b 1): 2 docs, srcA only -> violating
    // class Z (en, len_b 2, wc_b 3): 1 doc,  srcB only -> violating
    val x = (1L to 6L).map { i =>
      val src = if (i <= 3) "srcA" else "srcB"
      (i, words(25), "en", src, 150L)
    }
    val y = Seq((7L, words(12), "de", "srcA", 50L),
                (8L, words(12), "de", "srcA", 50L))
    val z = Seq((9L, words(31), "en", "srcB", 250L))
    val dir = stageDocs(x ++ y ++ z)
    val got = CorpusQueries.q269KAnonymity(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_violating"),
          r.getAs[Long]("n_classes"), r.getAs[Long]("min_class_size"),
          r.getAs[Long]("viol_share_e6"))).toMap
    assert(got("srcA") == ((5L, 2L, 2L, 2L, 400000L)))
    assert(got("srcB") == ((4L, 1L, 2L, 1L, 250000L)))
  }

  test("q269 violating counts replay from a brute-force class census") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        val qi = (r.getAs[String]("lang"), r.getAs[Long]("n_chars") / 100,
          r.getAs[String]("text").split(" ", -1).length.toLong / 10)
        (r.getAs[String]("source"), qi)
      }
    val classSize = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expect = docs.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.length.toLong,
        xs.count(d => classSize(d._2) < 5).toLong,
        xs.map(_._2).distinct.length.toLong,
        xs.map(d => classSize(d._2)).min)
    }
    val got = CorpusQueries.q269KAnonymity(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_violating"),
          r.getAs[Long]("n_classes"), r.getAs[Long]("min_class_size"))).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("q271 flags exactly the constructed single-source classes") {
    // class (en, 1, 2): docs from BOTH sources -> l = 2, safe
    // class (en, 2, 3): 3 docs all from srcA   -> l = 1, at risk
    // class (de, 0, 1): 2 docs all from srcB   -> l = 1, at risk
    val safe = Seq((1L, words(25), "en", "srcA", 150L),
                   (2L, words(25), "en", "srcB", 150L))
    val riskEn = (3L to 5L).map(i => (i, words(31), "en", "srcA", 250L))
    val riskDe = Seq((6L, words(12), "de", "srcB", 50L),
                     (7L, words(12), "de", "srcB", 50L))
    val dir = stageDocs(safe ++ riskEn ++ riskDe)
    val got = CorpusQueries.q271LDiversity(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_classes"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("min_l"), r.getAs[Long]("n_classes_low"),
          r.getAs[Long]("n_docs_at_risk"), r.getAs[Long]("risk_share_e6"))).toMap
    assert(got("en") == ((2L, 5L, 1L, 1L, 3L, 600000L)))
    assert(got("de") == ((1L, 2L, 1L, 1L, 2L, 1000000L)))
  }

  test("q275 ladder: coarsening merges the constructed violation away") {
    // en: two level-0 classes of 3 docs each (violating) that MERGE at
    // level 1 into one class of 6 -> safe from level 1 on.
    // de: a single doc no level can fix -> min_safe_level = -1.
    val en = (1L to 3L).map(i => (i, words(31), "en", "srcA", 250L)) ++
      (4L to 6L).map(i => (i, words(35), "en", "srcA", 350L))
    val de = Seq((7L, words(12), "de", "srcB", 50L))
    val dir = stageDocs(en ++ de)
    val got = CorpusQueries.q275GeneralizationLadder(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("lvl")) ->
        (r.getAs[Long]("n_classes"), r.getAs[Long]("n_violating"),
          r.getAs[Long]("min_safe_level"))).toMap
    assert(got(("en", 0)) == ((2L, 6L, 1L)))
    assert(got(("en", 1)) == ((1L, 0L, 1L)))
    assert(got(("en", 3)) == ((1L, 0L, 1L)))
    (0 to 3).foreach(l => assert(got(("de", l)) == ((1L, 1L, -1L))))
  }

  test("q275 fixture: violations are monotone in level, min_safe is first zero") {
    val rows = CorpusQueries.q275GeneralizationLadder(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("lvl"),
        r.getAs[Long]("n_classes"), r.getAs[Long]("n_violating"),
        r.getAs[Long]("min_safe_level")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, xs) =>
      val byLvl = xs.sortBy(_._2)
      assert(byLvl.map(_._2).toSeq == Seq(0, 1, 2, 3))
      // a merged class below k implies every member was below k, so
      // coarsening can never create new violating documents
      byLvl.sliding(2).foreach { w =>
        assert(w(1)._4 <= w(0)._4 && w(1)._3 <= w(0)._3, s"lang $lang")
      }
      val ms = byLvl.head._5
      assert(byLvl.forall(_._5 == ms))
      if (ms >= 0) byLvl.foreach(x =>
        assert((x._4 == 0) == (x._2 >= ms), s"lang $lang lvl ${x._2}"))
      else assert(byLvl.forall(_._4 > 0))
    }
  }

  test("q276 verdict masses replay from the salted license draw") {
    def license(docId: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"lic_$docId".getBytes("UTF-8"))
      val idx = (java.lang.Long.parseLong(
        md.take(1).map("%02x".format(_)).mkString, 16) % 5).toInt
      Seq("cc0", "ccby", "ccbysa", "proprietary", "unknown")(idx)
    }
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("source"),
        license(r.getAs[Long]("doc_id"))))
    val expect = docs.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.length.toLong,
        xs.count(d => d._2 == "cc0" || d._2 == "ccby").toLong,
        xs.count(_._2 == "ccbysa").toLong,
        xs.count(_._2 == "proprietary").toLong,
        xs.count(_._2 == "unknown").toLong)
    }
    val got = CorpusQueries.q276LicenseGate(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_allowed"),
          r.getAs[Long]("n_conditional"), r.getAs[Long]("n_blocked"),
          r.getAs[Long]("n_unknown"))).toMap
    assert(got == expect && got.nonEmpty)
    // all five verdicts actually occur somewhere on the fixture
    assert(got.values.map(_._2).sum > 0 && got.values.map(_._3).sum > 0 &&
      got.values.map(_._4).sum > 0 && got.values.map(_._5).sum > 0)
  }

  test("q278 diff pins constructed removed/changed/unchanged docs") {
    // id 11 removed (%11), id 13 changed (%13), id 1 untouched,
    // id 143 = 11*13 removed (drop precedes edit), id 22 removed
    val dir = stageDocs(Seq(
      (1L, "stable text", "en", "s", 11L),
      (11L, "will vanish", "en", "s", 11L),
      (13L, "will change", "en", "s", 11L),
      (22L, "also vanishes", "en", "t", 13L),
      (143L, "vanishes despite 13", "en", "t", 19L)))
    val got = CorpusQueries.q278CorpusDiff(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_old"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("n_changed"), r.getAs[Long]("n_unchanged"),
          r.getAs[Long]("chars_delta"), r.getAs[Long]("churn_e6"))).toMap
    // id 13 gains ' rev6' -> +5 chars
    assert(got("s") == ((3L, 1L, 1L, 1L, 5L, 666666L)))
    assert(got("t") == ((2L, 2L, 0L, 0L, 0L, 1000000L)))
  }

  test("q278 fixture: diff masses partition the old snapshot") {
    val rows = CorpusQueries.q278CorpusDiff(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_old") == r.getAs[Long]("n_removed") +
        r.getAs[Long]("n_changed") + r.getAs[Long]("n_unchanged"))
      // the revision marker is ' rev<digit>' -> exactly +5 chars per doc
      assert(r.getAs[Long]("chars_delta") == 5 * r.getAs[Long]("n_changed"))
    }
  }

  test("q270 classifies a hand-built page block by block") {
    // doc 0 / source s: header (9 toks, 3 linkish -> LINKY+NO-STOP),
    // chunk1 with stopwords -> CONTENT, chunk2 stopword-free ->
    // NO-STOP, footer (4 toks, 2 linkish -> SHORT+LINKY+NO-STOP)
    val chunk1 = "the cat sat on a mat with one two red dog fox"
    val chunk2 = "red dog fox cat mat sun sky sea rock tree bird fish"
    val d0 = (0L, s"$chunk1 $chunk2", "en", "s", 100L)
    // doc 1 / source t: single stopword-free chunk -> zero content
    // blocks -> counts as all-boiler
    val d1 = (1L, words(12), "en", "t", 100L)
    val dir = stageDocs(Seq(d0, d1))
    val got = QualityFilterQueries.q270ContentExtraction(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("n_short"),
          r.getAs[Long]("n_link"), r.getAs[Long]("n_nostop"),
          r.getAs[Long]("n_content"), r.getAs[Long]("retained_words"),
          r.getAs[Long]("total_words"), r.getAs[Long]("n_docs_all_boiler"),
          r.getAs[Long]("retention_e6"))).toMap
    // source s: 4 blocks, words 9+12+12+4=37, kept=chunk1's 12
    assert(got("s") == ((4L, 1L, 2L, 3L, 1L, 12L, 37L, 0L, 324324L)))
    // source t: header+chunk+footer, 9+12+4=25 words, nothing kept
    assert(got("t") == ((3L, 1L, 2L, 3L, 0L, 0L, 25L, 1L, 0L)))
  }

  test("q270 fixture invariants: rule coverage and retention replay") {
    val rows = QualityFilterQueries.q270ContentExtraction(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docs, blocks, short, link, nostop, content, kept, all) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_blocks"),
          r.getAs[Long]("n_short"), r.getAs[Long]("n_link"),
          r.getAs[Long]("n_nostop"), r.getAs[Long]("n_content"),
          r.getAs[Long]("retained_words"), r.getAs[Long]("total_words"))
      // every doc contributes header + >=1 chunk + footer
      assert(blocks >= 3 * docs && content <= blocks)
      // the footer is always SHORT; header and footer are always LINKY
      // and stopword-free
      assert(short >= docs && link >= 2 * docs && nostop >= 2 * docs)
      // every non-content block fails at least one rule
      assert(short + link + nostop >= blocks - content)
      assert(kept <= all && kept >= 6 * content)
      assert(r.getAs[Long]("retention_e6") == 1000000L * kept / all)
      assert(r.getAs[Long]("n_docs_all_boiler") <= docs)
    }
  }
}
