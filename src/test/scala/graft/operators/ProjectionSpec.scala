package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** Invariants and exact differentials for the sixth-wave embedding
  * operators (q154-q156). */
class ProjectionSpec extends AnyFunSuite {

  test("q154 vote bookkeeping is internally consistent") {
    val rows = ProjectionQueries.q154KnnClassify(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 5, "votes out of [1,5]")
      assert(r.getBoolean(4) == (r.getInt(1) == r.getInt(2)),
        "correct flag disagrees with labels")
    }
  }

  test("q155 projected cosines are valid and the error column is derived") {
    val rows = ProjectionQueries.q155RandomProjection(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (co, cp, e) = (r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(cp >= -1.0000001 && cp <= 1.0000001, s"cos_proj $cp out of range")
      assert(e == math.floor(math.abs(co - cp) * 1000000.0).toLong,
        "err_e6 is not the floor-quantized |cos_orig - cos_proj|")
    }
  }

  test("q156 distributed power iteration == exact driver-side replay") {
    val got = ProjectionQueries.q156PowerIteration(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exact integer replay on the collected matrix
    val m = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))"))
      .collect().map(_.getSeq[Long](1).toArray)
    val dim = 64
    var v = Array.fill(dim)(10000L)
    for (_ <- 1 to 3) {
      val u = m.map(row => (0 until dim).map(d => row(d) * v(d)).sum)
      val y = (0 until dim).map(d =>
        m.indices.map(r => m(r)(d) * u(r)).sum).toArray
      val ymax = y.map(math.abs).max
      v = y.map(yd => math.floor(yd.toDouble / ymax.toDouble * 10000.0).toLong)
    }
    val expected = v.zipWithIndex.map { case (vq, i) => (i + 1) -> vq }.toMap
    assert(got == expected)
    // normalization invariant: some dimension sits at +/-1e4, none beyond
    assert(got.values.map(math.abs).max == 10000L)
  }

  test("q157 distributed covariance lattice == exact driver-side replay") {
    val got = ProjectionQueries.q157CovarianceTopk(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val m = graft.Tables.embeddings(spark, sfDir)
      .select(expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))"))
      .collect().map(_.getSeq[Long](0).toArray)
    val dim = 64
    val n = m.length.toLong
    val sums = (0 until dim).map(d => m.map(_(d)).sum)
    val all = for (i <- 0 until dim; j <- i + 1 until dim) yield {
      val p = m.map(row => row(i) * row(j)).sum
      (i + 1, j + 1, n * p - sums(i) * sums(j))
    }
    val expected = all.sortBy { case (i, j, c) => (-math.abs(c), i, j) }.take(20)
    assert(got.toSeq == expected)
  }
}
