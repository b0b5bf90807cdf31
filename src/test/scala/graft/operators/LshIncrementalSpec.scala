package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q311's incremental contract: signaturing only the delta batch and
  * joining its bands against the standing index yields EXACTLY the
  * full-rebuild pair stream — including the constructed case where the
  * delta carries near-dups of standing documents (the cross pairs only
  * the delta join can find) and near-dups of itself. */
class LshIncrementalSpec extends AnyFunSuite {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def fullRebuild(all: org.apache.spark.sql.DataFrame) = {
    val stage = graft.Staging.fresh("lshfull")
    DedupQueries.lshIndexBuild(spark, all, stage)
    spark.read.parquet(s"$stage/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(p => (p._1, p._2))
  }

  test("constructed near-dup delta: incremental == full rebuild, cross pairs found") {
    val base = docsDf(Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven eight nine",
      3L -> "red orange yellow green blue indigo violet"))
    // delta: a near-dup of base doc 1 (cross pair), twin near-dups of
    // each other (delta-delta pair), and an unrelated doc (no pair)
    val delta = docsDf(Seq(
      17L -> "alpha beta gamma delta epsilon zeta eta theta extra",
      27L -> "lorem ipsum dolor sit amet consectetur adipiscing",
      37L -> "lorem ipsum dolor sit amet consectetur elit",
      47L -> "completely different words with nothing shared here"))
    val stage = graft.Staging.fresh("lshincspec")
    DedupQueries.lshIndexBuild(spark, base, stage)
    val inc = DedupQueries.lshDeltaUpdate(spark, delta, base.unionByName(delta), stage)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val full = fullRebuild(base.unionByName(delta))
    assert(inc == full)
    val pairs = inc.map(p => (p._1, p._2)).toSet
    assert(pairs((1L, 17L)), "base-delta cross near-dup must surface")
    assert(pairs((27L, 37L)), "delta-delta near-dup must surface")
    assert(!pairs.exists(p => p._1 == 47L || p._2 == 47L), "unrelated delta stays unpaired")
  }

  test("registered q311 == full rebuild on the fixture split") {
    val all = graft.Tables.documents(spark, sfDir)
    val inc = DedupQueries.q311LshIncremental(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(inc == fullRebuild(all) && inc.nonEmpty)
    // the fixture delta genuinely contributes pairs (else the test is vacuous)
    assert(inc.exists(p => p._1 % 10 == 7 || p._2 % 10 == 7))
  }
}
