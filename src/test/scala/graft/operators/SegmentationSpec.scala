package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** Differential proofs for the fifth-wave segmentation/allocation
  * operators: q150's two-phase tertile assignment against a full
  * driver-side reimplementation, q152's two-phase median/MAD against
  * sorted-array selection, q153's conservation law, and q151's shares
  * summing to one.
  */
class SegmentationSpec extends AnyFunSuite {

  test("q150 two-phase tertile segmentation == driver-side brute force") {
    val got = SegmentationQueries.q150RfmSegments(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent reimplementation: collect orders, build r/f/m, cut at
    // ranks n/3 and 2n/3 under the (v, ck) total order
    val orders = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("date"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val anchor = orders.map(_._2.toEpochDay).max
    val pc = orders.groupBy(_._1).map { case (ck, rows) =>
      (ck, anchor - rows.map(_._2.toEpochDay).max,
        rows.size.toLong, rows.map(_._3).sum)
    }.toArray
    val n = pc.length
    def tert(vs: Array[(Long, Long)]): Map[Long, Int] = {
      val sorted = vs.sortBy(identity)
      val b1 = sorted(n / 3 - 1); val b2 = sorted(2 * n / 3 - 1)
      vs.map { case t @ (v, ck) =>
        ck -> (if (Ordering[(Long, Long)].lteq(t, b1)) 1
               else if (Ordering[(Long, Long)].lteq(t, b2)) 2 else 3)
      }.toMap
    }
    val tr = tert(pc.map(t => (t._2, t._1)))
    val tf = tert(pc.map(t => (t._3, t._1)))
    val tm = tert(pc.map(t => (t._4, t._1)))
    val expected = pc.groupBy(t => s"r${tr(t._1)}f${tf(t._1)}m${tm(t._1)}")
      .map { case (seg, rows) => seg -> (rows.length.toLong, rows.map(_._4).sum) }
    assert(got == expected && got.nonEmpty)
  }

  test("q152 two-phase median and MAD == sorted-array selection") {
    val got = SegmentationQueries.q152RobustStats(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val byType = graft.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    def sel(vs: Array[Double]): Double = {
      val s = vs.sorted; val n = s.length
      (s((n + 1) / 2 - 1) + s(n / 2)) / 2.0
    }
    val expected = byType.map { case (t, rows) =>
      val vs = rows.map(_._2)
      val med = sel(vs)
      t -> (med, sel(vs.map(v => math.abs(v - med))))
    }
    assert(got == expected && got.nonEmpty)
  }

  test("q153 allocation conserves exactly 1000 units per order") {
    val rows = SegmentationQueries.q153LargestRemainder(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (ok, rs) =>
      assert(rs.map(_.getLong(3)).sum == 1000L, s"order $ok allocation leaks")
    }
    // proportionality: alloc is within 1 unit of the exact quota
    rows.groupBy(_.getLong(0)).foreach { case (ok, rs) =>
      val qsum = rs.map(_.getLong(2)).sum
      for (r <- rs) {
        val quota = 1000.0 * r.getLong(2) / qsum
        assert(math.abs(r.getLong(3) - quota) < 1.0,
          s"order $ok line ${r.getInt(1)}: alloc ${r.getLong(3)} vs quota $quota")
      }
    }
  }

  test("q166 gini == driver-side exact formula, and sits in [0, 1)") {
    val row = SegmentationQueries.q166Gini(spark, sfDir).head()
    val spend = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ck, rs) => (ck, rs.map(_._2).sum) }.toArray
    val sorted = spend.map { case (ck, m) => (m, ck) }.sorted.map(_._1)
    val n = sorted.length.toLong
    val s0 = sorted.sum
    val s1 = sorted.zipWithIndex.map { case (m, i) => (i + 1) * m }.sum
    val expected =
      math.floor((2 * s1 - (n + 1) * s0).toDouble / (n * s0).toDouble * 1e6).toLong
    assert(row.getLong(0) == n && row.getLong(1) == s0)
    assert(row.getLong(2) == expected)
    assert(row.getLong(2) >= 0 && row.getLong(2) < 1000000)
  }

  test("q167 weighted median splits the character mass at half") {
    val rows = SegmentationQueries.q167WeightedMedian(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byLang = graft.Tables.documents(spark, sfDir)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    for (r <- rows) {
      val (lang, tot, med) = (r.getString(0), r.getLong(1), r.getLong(2))
      val ws = byLang(lang).map(_._2)
      assert(ws.sum == tot)
      // mass at or below the boundary reaches ceil(W/2); strictly-below
      // mass does not
      assert(ws.filter(_ <= med).sum >= (tot + 1) / 2)
      assert(ws.filter(_ < med).sum < (tot + 1) / 2)
    }
  }

  test("q170 two-phase top-k == the single-window form it replaces") {
    val twoPhase = SegmentationQueries.q170TopkTwoPhase(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val naive = SegmentationQueries.topkNaive(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(twoPhase.toSeq == naive.toSeq && twoPhase.nonEmpty)
  }

  test("q183 grid-pruned skyline == brute dominance over all points") {
    val got = SegmentationQueries.q183Skyline(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pts = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("date"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val anchor = pts.map(_._2.toEpochDay).max
    val pc = pts.groupBy(_._1).map { case (ck, rs) =>
      (ck, rs.map(_._3).sum, anchor - rs.map(_._2.toEpochDay).max)
    }.toArray
    def dominates(p: (Long, Long, Long), q: (Long, Long, Long)) =
      p._2 >= q._2 && p._3 <= q._3 && (p._2 > q._2 || p._3 < q._3)
    val brute = pc.filter(q => !pc.exists(p => dominates(p, q))).toSet
    assert(got == brute && got.nonEmpty)
    // mutual non-domination within the front
    for (a <- got; b <- got if a != b) assert(!dominates(a, b))
  }

  test("q151 shares sum to one per region and globally") {
    val rows = SegmentationQueries.q151ShareOfTotal(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (reg, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"region $reg shares sum to $s")
    }
    val g = rows.map(_.getDouble(4)).sum
    assert(math.abs(g - 1.0) < 1e-9, s"global shares sum to $g")
  }
}
