package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q317's incremental contract: decoding and hashing only the delta
  * batch and joining its bands against the standing index yields
  * EXACTLY the full-rebuild pair stream. The constructed geometry works
  * the 64-char pixel window: the synthesized thumbnail reads code
  * points 1..64, so texts that agree through position 64 hash
  * bit-equal no matter what follows — the image analog of a re-crawled
  * page with a changed footer. */
class ImageIncrementalSpec extends AnyFunSuite {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq.sortBy(t => (t._1, t._2))

  private def fullRebuild(all: org.apache.spark.sql.DataFrame) = {
    val stage = graft.Staging.fresh("phfull")
    DedupQueries.imageIndexBuild(spark, all, stage)
    rows(spark.read.parquet(s"$stage/pairs"))
  }

  test("constructed footer-change delta: incremental == full rebuild, cross and delta-delta pairs") {
    // 70-char bodies; the first 64 chars ARE the thumbnail
    val bodyA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    val bodyB = "one two three four five six seven eight nine ten eleven twelve thirt"
    val bodyC = "completely different pixels here with nothing shared among the others"
    val base = docsDf(Seq(
      1L -> bodyA,
      2L -> (bodyA.take(64) + "~tail1"), // standing near-dup of 1 (same window)
      3L -> bodyB))
    // 17: re-crawl of doc 1 with a changed footer (identical 64-char
    // window -> hamming 0 cross pair); 27/37: identical windows, new
    // content (delta-delta pair); 47: unrelated
    val delta = docsDf(Seq(
      17L -> (bodyA.take(64) + "!!new footer"),
      27L -> (bodyB.take(64) + " promo"),
      37L -> (bodyB.take(64) + " other"),
      47L -> bodyC))
    val stage = graft.Staging.fresh("phincspec")
    DedupQueries.imageIndexBuild(spark, base, stage)
    val inc = rows(DedupQueries.imageDeltaUpdate(spark, delta, stage))
    val full = fullRebuild(base.unionByName(delta))
    assert(inc == full, "incremental must equal the full rebuild")
    val pairs = inc.map(t => (t._1, t._2)).toSet
    assert(pairs((1L, 2L)), "the staged base-base pair must survive the union")
    assert(pairs((1L, 17L)) && pairs((2L, 17L)),
      "the re-crawl must pair with both standing window-twins")
    assert(pairs((27L, 37L)), "delta-delta window twins must pair")
    assert(pairs((3L, 27L)) && pairs((3L, 37L)),
      "delta docs sharing a standing doc's window must cross-pair")
  }

  test("registered q317 == q307 full rebuild on the fixture split") {
    val inc = rows(DedupQueries.q317ImageIncremental(spark, sfDir))
    val full = rows(DedupQueries.q307ImageNeardup(spark, sfDir))
    assert(inc == full)
  }
}
