package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-12 data-selection wave (q215–q221): in-Spark differential
  * and property proofs independent of the DuckDB oracle gate — rule
  * discrimination (q215), the bounded-fanout sliding-distinct
  * decomposition against brute force (q216), DSIR's target preference
  * on a constructed two-vocabulary corpus (q217), retrieval-eval
  * invariants and the fixture recall floor (q218), exact-thirds sizing
  * and score-range ordering of the CCNet partition (q219), stream ==
  * batch for the streaming decontaminator (q220), and the TextRank hub
  * property on a constructed star graph (q221). */
class SelectionWaveSpec extends AnyFunSuite {
  import graft.SparkTestSession.{sfDir, spark}
  import spark.implicits._

  /** Write a minimal documents.parquet corpus into a fresh dir. */
  private def tinyCorpus(rows: Seq[(Long, String, String, String)]): String = {
    val dir = graft.Staging.fresh("wavecorpus")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q215: every rule rejects someone and someone passes everything") {
    val r = graft.SparkEntry.queries("q215_rules_gate")(spark, sfDir).collect()
    val total = r.map(_.getAs[Long]("n_docs")).sum
    assert(total === graft.Tables.documents(spark, sfDir).count(),
      "the audit must account for every document")
    for (c <- Seq("fail_wordcount", "fail_wordlen", "fail_stopword",
        "fail_repetition", "fail_topshare"))
      assert(r.map(_.getAs[Long](c)).sum >= 1L,
        s"rule $c never fires — its threshold does not discriminate")
    assert(r.map(_.getAs[Long]("n_pass")).sum >= 1L,
      "no document passes all rules — the gate rejects everything")
    r.foreach { row =>
      assert(row.getAs[Long]("n_pass") <= row.getAs[Long]("n_docs"))
      assert(row.getAs[Long]("pass_share_e6") ===
        1000000L * row.getAs[Long]("n_pass") / row.getAs[Long]("n_docs"))
    }
  }

  test("q216: bounded-fanout decomposition == brute-force range COUNT DISTINCT") {
    val got = graft.SparkEntry.queries("q216_sliding_distinct")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
    val days = ev.select("event_type", "d").distinct()
      .withColumnRenamed("d", "wd")
    val brute = days.join(ev, days("event_type") === ev("event_type") &&
        ev("d").between(date_sub(days("wd"), 6), days("wd")))
      .groupBy(days("event_type"), col("wd"))
      .agg(countDistinct("user_id").as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    assert(got.toSet === brute.toSet, "the 7x-fanout distinct must equal " +
      "the direct range-join COUNT DISTINCT")
    assert(got.nonEmpty)
  }

  test("q217: DSIR prefers the target vocabulary on a two-vocabulary corpus") {
    // target (en) docs draw from vocab A, the rest from vocab B; a few
    // raw docs also use vocab A — DSIR must surface exactly the
    // A-vocabulary docs regardless of their own language tag
    val aText = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    val bText = "omega sigma tau kappa omega sigma tau kappa omega sigma"
    val rows =
      (0L until 20L).map(i => (i, aText, "en", "src0")) ++     // target slice
      (20L until 26L).map(i => (i, aText, "de", "src1")) ++    // A-vocab raw docs
      (26L until 60L).map(i => (i, bText, "de", "src1"))       // B-vocab raw docs
    val dir = tinyCorpus(rows)
    val top = graft.SparkEntry.queries("q217_dsir_importance")(spark, dir)
      .collect()
    assert(top.length === 20)
    // every top-20 doc must be an A-vocabulary doc (ids < 26); the
    // B-vocabulary mass (34 docs) must rank below all of them
    top.foreach { r =>
      assert(r.getAs[Long]("doc_id") < 26L,
        s"B-vocabulary doc ${r.getAs[Long]("doc_id")} outranked target lookalikes")
    }
    // scores are non-increasing down the list (ranking is real)
    val scores = top.map(_.getAs[Long]("dsir_score_e6"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q218: eval invariants hold and the fixture recall clears the floor") {
    val r = graft.SparkEntry.queries("q218_retrieval_recall")(spark, sfDir)
      .collect()
    assert(r.length === 32, "one row per probe")
    r.foreach { row =>
      val (hits, rr) = (row.getAs[Long]("n_hits10"), row.getAs[Long]("rr_x2520"))
      assert(hits >= 0L && hits <= 10L)
      assert((rr > 0L) === (hits > 0L),
        "reciprocal rank is positive exactly when some true neighbor is found")
      if (rr > 0L) assert((1L to 10L).exists(k => rr === 2520L / k),
        s"rr $rr is not 2520 div r for any rank r in 1..10")
    }
    val mean = r.map(_.getAs[Long]("n_hits10")).sum.toDouble / r.length
    assert(mean >= 2.0, s"mean recall@10 $mean under the measured floor " +
      "(fixture measures ~4.5; the band geometry has not changed)")
  }

  test("q219: exact thirds per language, with score ranges in bucket order") {
    val rows = graft.SparkEntry.queries("q219_ccnet_buckets")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_docs"),
        r.getAs[Double]("min_score"), r.getAs[Double]("max_score")))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val by = rs.map(t => t._2 -> t).toMap
      val n = rs.map(_._3).sum
      assert(by("tail")._3 === n / 3, s"$lang tail size")
      assert(by("middle")._3 === 2 * n / 3 - n / 3, s"$lang middle size")
      assert(by("head")._3 === n - 2 * n / 3, s"$lang head size")
      // ascending score ranks: tail spans the lowest scores; ties on a
      // boundary make the comparison equal, never inverted
      assert(by("tail")._5 <= by("middle")._4 ||
        by("tail")._5 == by("middle")._4, s"$lang tail/middle order")
      assert(by("middle")._5 <= by("head")._4 ||
        by("middle")._5 == by("head")._4, s"$lang middle/head order")
    }
  }

  test("q220: the streaming decontaminator emits exactly q207's batch verdicts") {
    val stream = graft.SparkEntry
      .queries("q220_streaming_decontaminate")(spark, sfDir)
      .collect().map(_.toSeq)
    val batch = graft.SparkEntry
      .queries("q207_bloom_decontaminate")(spark, sfDir)
      .collect().map(_.toSeq)
    assert(stream.nonEmpty)
    assert(stream.toSeq === batch.toSeq,
      "stream and batch must produce identical rows in identical order")
  }

  test("q225: TV distances are bounded and every source is accounted for") {
    val r = graft.SparkEntry.queries("q225_token_drift")(spark, sfDir).collect()
    val nSources = graft.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(r.length === nSources)
    r.foreach { row =>
      val tv = row.getAs[Long]("tv_e6")
      assert(tv >= 0L && tv <= 1000000L, s"TV must live in [0, 1]: $tv")
      assert(row.getAs[Long]("n_grams") > 0L)
    }
  }

  test("q226: the leakage matrix re-derives from q22's pairs and q88's splits") {
    val got = graft.SparkEntry.queries("q226_split_leakage")(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("n_pairs"), r.getAs[Int]("is_leak")))).toMap
    val pairs = graft.SparkEntry.queries("q22_minhash_lsh")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val split = graft.Tables.documents(spark, sfDir)
      .withColumn("bucket", expr(
        "cast(conv(substring(md5(concat('split_', cast(doc_id as string))), 1, 4), 16, 10) as int) % 100"))
      .selectExpr("doc_id",
        "case when bucket < 90 then 'train' when bucket < 95 then 'valid' else 'test' end as s")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairs.groupBy { case (a, b) =>
      val (x, y) = (split(a), split(b))
      (if (x <= y) x else y, if (x <= y) y else x)
    }.map { case (k, v) => k -> v.length.toLong }
    assert(got.view.mapValues(_._1).toMap === expected,
      "the matrix must count exactly q22's pairs bucketed by q88's splits")
    got.foreach { case ((lo, hi), (_, leak)) =>
      assert(leak === (if (lo == hi) 0 else 1))
    }
  }

  test("q221: the hub of a star co-occurrence graph ranks first") {
    val rows = (0L until 12L).map(i => (i, s"hub word$i", "en", "src0")) ++
      Seq((12L, "lonely pairx", "en", "src0"))
    val dir = tinyCorpus(rows)
    val top = graft.SparkEntry.queries("q221_textrank")(spark, dir).collect()
    assert(top.head.getAs[String]("word") === "hub",
      "the word adjacent to 12 distinct words must out-rank every spoke")
    assert(top.head.getAs[Long]("degree") === 12L)
    val ranks = top.map(_.getAs[Double]("rank"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
  }
}
