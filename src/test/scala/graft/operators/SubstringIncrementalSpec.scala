package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q314's incremental contract: winnowing only the delta batch and
  * joining its postings against the standing index yields EXACTLY the
  * full-rebuild substring runs — including the two cases the fixture
  * alone cannot exercise together: a delta that pushes a standing
  * boilerplate print over the df cap (the staged base-base run must
  * DISAPPEAR through the newly-stopped correction) and a delta that
  * shares a live unique substring with a standing doc (the cross run
  * only the delta join can find). */
class SubstringIncrementalSpec extends AnyFunSuite {

  private val (k, w) = (4, 5)

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq.sortBy(t => (t._1, t._2, t._3))

  /** Full rebuild == the standing index built over ALL docs: its staged
    * `runs` aggregate at the full-corpus df gate, thresholded. */
  private def fullRebuild(all: org.apache.spark.sql.DataFrame,
                          dfCap: Long, minPrints: Long) = {
    val stage = graft.Staging.fresh("subfull")
    DedupQueries.substringRunIndexBuild(spark, all, stage, k, w, dfCap)
    rows(spark.read.parquet(s"$stage/runs")
      .filter(col("n_prints") >= minPrints)
      .select(col("doc_a").cast("bigint"), col("doc_b").cast("bigint"),
        col("off"), col("n_prints").cast("bigint"),
        col("from_a").cast("bigint"),
        (col("to_a") - col("from_a") + lit(k)).cast("bigint"))
      .orderBy("doc_a", "doc_b", "off"))
  }

  test("constructed cap-crossing delta: incremental == full rebuild, " +
      "stop-print correction and cross runs both fire") {
    val s1 = "the quick brown fox jumps over the lazy dog again and again"
    val u1 = "unique marker block found only in document one right here"
    val bp = "standard legal boilerplate footer text common to several docs"
    val d34 = "delta twins share this exact promotional sentence block"
    val base = docsDf(Seq(
      1L -> s"alpha beta gamma words $s1 and then $u1",
      2L -> s"different filler opening here $s1 trailing tail",
      3L -> s"third doc filler content $bp",
      4L -> s"fourth doc other filler $bp"))
    val delta = docsDf(Seq(
      11L -> s"batch eleven opener words $u1",
      12L -> s"twelfth incoming page body $bp",
      13L -> s"thirteenth arrival preface $d34",
      15L -> s"fifteenth capture preamble $d34",
      16L -> "totally unrelated content with nothing shared at all whatsoever"))
    val (dfCap, minPrints) = (2L, 3L)

    val stage = graft.Staging.fresh("subincspec")
    DedupQueries.substringRunIndexBuild(spark, base, stage, k, w, dfCap)
    // pre-delta, the boilerplate pair is a standing run (else the
    // stop-print assertion below would be vacuous)
    val staged = rows(spark.read.parquet(s"$stage/runs")
      .filter(col("n_prints") >= minPrints)
      .select(col("doc_a").cast("bigint"), col("doc_b").cast("bigint"),
        col("off"), col("n_prints").cast("bigint"),
        col("from_a").cast("bigint"),
        (col("to_a") - col("from_a") + lit(k)).cast("bigint")))
    assert(staged.exists(t => t._1 == 3L && t._2 == 4L),
      "boilerplate base pair must exist before the delta lands")

    val inc = rows(DedupQueries.substringDeltaUpdate(
      spark, delta, stage, k, w, dfCap, minPrints))
    val full = fullRebuild(base.unionByName(delta), dfCap, minPrints)
    assert(inc == full, "incremental must equal the full rebuild")

    val pairs = inc.map(t => (t._1, t._2)).toSet
    assert(pairs((1L, 11L)), "cross run through the live unique block must surface")
    assert(pairs((13L, 15L)), "delta-delta shared block must surface")
    assert(!pairs.exists(p => p._1 == 3L && p._2 == 4L),
      "the boilerplate prints crossed the df cap — the staged base-base run must be retired")
    assert(!pairs.exists(p => p._1 == 12L || p._2 == 12L),
      "the doc that pushed the boilerplate over the cap pairs with nothing")
    assert(!pairs.exists(p => p._1 == 16L || p._2 == 16L),
      "unrelated delta doc stays unpaired")
  }

  test("registered q314 == full rebuild on the fixture split") {
    val base = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val all = base.unionByName(
      base.filter(col("doc_id") % 10 === 3)
        .select((-col("doc_id") - lit(1L)).as("doc_id"),
          concat(col("text"),
            lit(" subscribe to the graft weekly digest for fresh pipeline updates today"))
            .as("text")))
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val inc = rows(DedupQueries.q314SubstringIncremental(spark, sfDir))
    assert(inc == fullRebuild(all, dfCap = 64L, minPrints = 5L) && inc.nonEmpty)
    // the fixture delta genuinely contributes runs (else the test is vacuous)
    assert(inc.exists(t => t._1 < 0 || t._2 < 0))
  }
}
