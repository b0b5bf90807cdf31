package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}
import graft.multimodal.BinaryPipeline

/** q307's image near-dup geometry, pinned end-to-end: a one-block luma
  * flip in the synthesized thumbnail moves EXACTLY one aHash bit and the
  * pair surfaces through the banded join; the pigeonhole losslessness of
  * 4×16 banding at hamming ≤ 3 is exercised adversarially (worst-case
  * spread across 3 bands present, hamming-4 absent even when banding
  * WOULD surface it); and the full query equals brute-force all-pairs. */
class ImageNeardupSpec extends AnyFunSuite {

  private def hashOfTexts(texts: Seq[(Long, String)]): Map[Long, Long] = {
    val s2 = spark
    import s2.implicits._
    val docs = texts.toDF("doc_id", "text").withColumn("source", lit("t"))
    val rows = BinaryPipeline.imageMediaFromText(docs).transform(BinaryPipeline.perceptualHash).collect()
    assert(rows.forall(_.real), "synthesized Y4M thumbnails must demux to real pixels")
    rows.map(r => r.doc_id -> r.ahash).toMap
  }

  test("one-block flip moves exactly one aHash bit and surfaces as a hamming-1 pair") {
    // base: 32 dark ('0' = 48) + 32 bright ('z' = 122) pixels, mean 85 —
    // every pixel sits >= 36 luma away from the mean, so flipping ONE
    // pixel dark->bright shifts the floor-mean by only 1 and no boundary
    // bit moves: the hashes differ in exactly bit 0
    val base = "0" * 32 + "z" * 32
    val flip = "z" + "0" * 31 + "z" * 32
    val flat = "A" * 64 // constant plane: nothing strictly above the mean
    val h = hashOfTexts(Seq(1L -> base, 2L -> flip, 3L -> flat))
    assert(java.lang.Long.bitCount(h(1L) ^ h(2L)) == 1 &&
      (h(1L) ^ h(2L)) == 1L, "exactly bit 0 flips")
    assert(h(3L) == 0L, "constant plane hashes to 0 (strict-greater rule)")
    val s2 = spark
    import s2.implicits._
    val pairs = DedupQueries.ahashBandedPairs(
      h.toSeq.toDF("doc_id", "ahash")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1)),
      "near-dup pair surfaces at hamming 1; the unrelated plane does not")
  }

  test("4x16 banding is pigeonhole-lossless at hamming <= 3, and the cut is exact") {
    val s2 = spark
    import s2.implicits._
    // worst-case hamming-3: one flipped bit in each of bands 1,2,3 — only
    // band 0 agrees, and that single agreement must carry the pair
    val spread3 = (1L << 16) | (1L << 32) | (1L << 48)
    // hamming-4 concentrated in band 0: bands 1-3 all agree, so banding
    // SURFACES the candidate — the hamming filter must still drop it
    val dense4 = 15L
    // sign-bit hash: band 3's key must come from the masked shiftright
    val signBit = java.lang.Long.MIN_VALUE
    val ph = Seq(1L -> 0L, 2L -> spread3, 3L -> dense4, 4L -> signBit,
      5L -> (signBit | 1L)).toDF("doc_id", "ahash")
    val got = DedupQueries.ahashBandedPairs(ph).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got((1L, 2L, 3)), "worst-case 3-band spread still collides on the 4th band")
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L), "hamming 4 is cut")
    assert(got((4L, 5L, 1)), "sign-bit hashes band and pair correctly")
  }

  test("q307 equals brute-force all-pairs hamming <= 3 on the fixture") {
    val hashed = BinaryPipeline
      .perceptualHash(BinaryPipeline.imageMediaFromText(
        graft.Tables.documents(spark, sfDir)))
      .collect()
    assert(hashed.nonEmpty && hashed.forall(_.real))
    val hs = hashed.map(r => r.doc_id -> r.ahash).sortBy(_._1)
    val brute = (for {
      i <- hs.indices.iterator
      j <- (i + 1) until hs.length
      hd = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if hd <= 3
    } yield (hs(i)._1, hs(j)._1, hd)).toSeq.sorted
    val got = DedupQueries.q307ImageNeardup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == brute && brute.nonEmpty)
  }
}
