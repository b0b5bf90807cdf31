package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q158's unrolled peel is the true k-core: the 6-pass result is a
  * fixpoint (nothing left to peel) and equals a driver-side peel run to
  * convergence. */
class KcoreSpec extends AnyFunSuite {

  private def bruteKcore(k: Int): Map[Long, Long] = {
    val s2 = spark
    import s2.implicits._
    val op = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 15000)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    var edges = op.as("a").join(op.as("b"), $"a.o" === $"b.o" && $"a.p" < $"b.p")
      .select($"a.p", $"b.p").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != edges.size
      edges = next
    }
    edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
  }

  test("q158 6-pass unroll == peel-to-convergence, and is a fixpoint") {
    val got = AnalyticsQueries.q158Kcore(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteKcore(4) && got.nonEmpty)
    // fixpoint: every surviving degree >= k, so a 7th pass peels nothing
    assert(got.values.forall(_ >= 4))
  }
}
