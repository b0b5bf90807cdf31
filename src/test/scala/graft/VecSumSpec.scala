package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_vecsum must equal the posexplode + per-position hash aggregate it
  * replaces (q157's pre-round-15 shape), under any partitioning. */
class VecSumSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def arrs = {
    import spark.implicits._
    (1 to 97).map(i => Seq(i.toLong, -2L * i, i.toLong * i, 7L))
      .toDF("a")
  }

  test("graft_vecsum equals the exploded per-position sums") {
    import spark.implicits._
    val viaVecsum = arrs.agg(expr("graft_vecsum(a)")).as[Seq[Long]].head()
    val viaExplode = arrs
      .select(posexplode(col("a")).as(Seq("pos", "v")))
      .groupBy("pos").agg(sum("v").as("s"))
      .orderBy("pos").as[(Int, Long)].collect().map(_._2).toSeq
    assert(viaVecsum === viaExplode)
  }

  test("result is invariant under partitioning (merge path)") {
    import spark.implicits._
    val one = arrs.coalesce(1).agg(expr("graft_vecsum(a)")).as[Seq[Long]].head()
    val many = arrs.repartition(7).agg(expr("graft_vecsum(a)")).as[Seq[Long]].head()
    assert(one === many)
  }

  test("null rows are skipped; an all-null group yields null") {
    val r = spark.sql(
      "SELECT graft_vecsum(a) FROM VALUES (array(1L, 2L)), (CAST(NULL AS ARRAY<BIGINT>)), " +
        "(array(10L, 20L)) AS t(a)").first()
    assert(r.getSeq[Long](0) === Seq(11L, 22L))
    val n = spark.sql(
      "SELECT graft_vecsum(a) FROM VALUES (CAST(NULL AS ARRAY<BIGINT>)) AS t(a)").first()
    assert(n.isNullAt(0))
  }

  test("ragged input fails loudly instead of truncating") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_vecsum(a) FROM VALUES (array(1L)), (array(1L, 2L)) AS t(a)")
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("groups with per-group widths work (per-label centroid shape)") {
    val rows = spark.sql(
      "SELECT l, graft_vecsum(a) AS s FROM VALUES (0, array(1L, 2L)), (0, array(3L, 4L)), " +
        "(1, array(10L, 20L, 30L)) AS t(l, a) GROUP BY l ORDER BY l").collect()
    assert(rows(0).getSeq[Long](1) === Seq(4L, 6L))
    assert(rows(1).getSeq[Long](1) === Seq(10L, 20L, 30L))
  }
}
