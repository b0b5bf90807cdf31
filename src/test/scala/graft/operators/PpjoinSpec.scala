package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-filtered exact set-similarity join (q112 core): constructed
  * pairs with hand-computable Jaccard, and the LOSSLESSNESS differential
  * — the prefix-filtered result must equal a brute-force join that
  * candidates on ANY shared shingle (no prefix restriction), proving the
  * filter discards no qualifying pair. */
class PpjoinSpec extends AnyFunSuite {
  import graft.SparkTestSession.{sfDir, spark}
  import spark.implicits._

  test("constructed pairs: exact jaccard, threshold edge, disjoint excluded") {
    // 5-token shingles: doc 1 = {abcde, bcdef, cdefg}; doc 2 = {abcde,
    // bcdef} — common 2, union 3 -> J = 2/3; doc 3 disjoint; doc 4 too
    // short for any shingle
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f"),
      (3L, "x y z w v u"),
      (4L, "a b c d")
    ).toDF("doc_id", "text")
    val j = 2.0 / 3.0
    val out = DedupQueries.ppjoinJaccard(docs, tau = 0.5)
      .select("a", "b", "common", "jaccard").orderBy("a", "b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 2L, j)))
    // threshold edge: >= keeps an exactly-equal jaccard...
    val edge = DedupQueries.ppjoinJaccard(docs, tau = j)
      .select("a", "b", "common", "jaccard").orderBy("a", "b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(edge === Seq((1L, 2L, 2L, j)))
    // ...and anything strictly above drops it
    val strict = DedupQueries.ppjoinJaccard(docs, tau = 0.7)
      .select("a", "b", "common", "jaccard").orderBy("a", "b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(strict.isEmpty, "2/3 must fall below a 0.7 threshold")
  }

  test("prefix filtering is lossless on the fixture") {
    val tau = 0.5
    val viaPrefix = DedupQueries
      .ppjoinJaccard(graft.Tables.documents(spark, sfDir), tau)
      .select("a", "b", "common", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    // brute force: candidate on ANY shared shingle, same exact verify
    val sh = DedupQueries.shingleSets(graft.Tables.documents(spark, sfDir))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.select(col("doc_id").as("a"), col("sh"))
      .join(sh.select(col("doc_id").as("b"), col("sh")), "sh")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .withColumn("jaccard",
        expr("cast(common as double) / cast(na + nb - common as double)"))
      .filter(col("jaccard") >= tau)
      .select(col("a").cast("bigint"), col("b").cast("bigint"),
        col("common").cast("bigint"), col("jaccard"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaPrefix === brute,
      "the prefix filter must not drop any qualifying pair")
    assert(brute.nonEmpty, "fixture must contain at least one near-dup pair")
  }

  test("q178 containment: directed semantics on constructed docs") {
    // doc 1 shingles {abcde,bcdef,cdefg}; doc 2 {abcde,bcdef}:
    // c(2→1) = 2/2 = 1.0, c(1→2) = 2/3 ≈ .667 — direction matters
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f"),
      (3L, "x y z w v u")
    ).toDF("doc_id", "text")
    val strict = DedupQueries.containmentJoin(docs, t = 0.7)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(strict === Set((2L, 1L)), "only the contained direction qualifies")
    val loose = DedupQueries.containmentJoin(docs, t = 0.6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(loose === Set((2L, 1L), (1L, 2L)))
  }

  test("q178 asymmetric prefix filtering is lossless on the fixture") {
    val t = 0.7
    val viaPrefix = DedupQueries
      .containmentJoin(graft.Tables.documents(spark, sfDir), t)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val sh = DedupQueries.shingleSets(graft.Tables.documents(spark, sfDir))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.select(col("doc_id").as("a"), col("sh"))
      .join(sh.select(col("doc_id").as("b"), col("sh")), "sh")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .withColumn("containment",
        expr("cast(common as double) / cast(na as double)"))
      .filter(col("containment") >= t)
      .select(col("a").cast("bigint"), col("b").cast("bigint"),
        col("common").cast("bigint"), col("na").cast("bigint"),
        col("containment"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(viaPrefix === brute,
      "the probe-side prefix must not drop any qualifying directed pair")
    assert(brute.nonEmpty, "fixture must contain at least one containment pair")
  }

  test("q277 sweep: monotone in tau, level 5 equals the q112 pair set") {
    val rows = DedupQueries.q277ThresholdSweep(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("tau_e1"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs_linked"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(5, 6, 7, 8, 9))
    // a finer threshold can only drop pairs (and so linked docs)
    rows.sliding(2).foreach { w =>
      assert(w(1)._2 <= w(0)._2 && w(1)._3 <= w(0)._3)
    }
    // the loosest level is exactly q112's tau = 0.5 output
    val q112 = DedupQueries.q112PpjoinJaccard(spark, sfDir).count()
    assert(rows.head._2 == q112 && q112 > 0)
    // every pair links two docs, shared docs only reduce the count
    rows.foreach { case (_, np, ndl) =>
      assert(ndl <= 2 * np && (np == 0L || ndl >= 2L))
    }
  }
}
