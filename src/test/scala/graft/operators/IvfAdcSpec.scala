package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** q212 IVF-ADC composition: the bucket-containment guarantee (every
  * reported neighbor lives in the probe's inverted-file bucket), the
  * rank-order contract, and recall against q25's exact baseline.
  */
class IvfAdcSpec extends AnyFunSuite {

  private lazy val out = SimilarityQueries.q212IvfAdc(spark, sfDir).collect()

  test("q212 every reported neighbor shares the probe's IVF bucket") {
    val centroid = SimilarityQueries
      .ivfAssigned(spark, sfDir, SimilarityQueries.ivfTrainSampleMod)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p, n) = (r.getLong(0), r.getLong(1))
      assert(centroid(p) === centroid(n),
        s"probe $p (bucket ${centroid(p)}) reported $n from bucket ${centroid(n)}")
    }
  }

  test("q212 ranks are dense and cosine-descending per probe") {
    out.groupBy(_.getLong(0)).foreach { case (p, rows) =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq === (1 to sorted.length))
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"probe $p: cosines must descend")
    }
  }

  test("q212 recall@3 against the exact baseline clears the floor") {
    val exact = SimilarityQueries.q25CosineTopk(spark, sfDir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = out.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = exact.keys.toSeq.map { p =>
      (got.getOrElse(p, Set.empty) intersect exact(p)).size
    }.sum
    val total = exact.values.map(_.size).sum
    val recall = hits.toDouble / total
    assert(recall >= 0.4, s"IVF-ADC recall@3 $recall below floor " +
      "(bucket restriction + 8-bit codes at nprobe=1)")
  }
}
