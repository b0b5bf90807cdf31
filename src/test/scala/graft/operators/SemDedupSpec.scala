package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-scoped semantic dedup (q105 core) on a constructed corpus
  * where the duplicate structure is known exactly: an identical copy and
  * a near-copy must be dropped (greedy keep-lowest-id), orthogonal
  * vectors must all survive, and the per-cluster scorecard must conserve
  * members. */
class SemDedupSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark
  import spark.implicits._

  private lazy val e = {
    // 18 one-hot directions + vec 18 = exact copy of vec 3 (cos 1.0)
    // + vec 19 = near-copy of vec 5 (cos ~0.995); everything else is
    // mutually orthogonal (cos 0)
    val rows = (0L until 20L).map { i =>
      val v = Array.fill(64)(0.0)
      i match {
        case 18L => v(3) = 1.0
        case 19L => v(5) = 1.0; v(7) = 0.1
        case k => v(k.toInt) = 1.0
      }
      (i, v.toSeq)
    }
    rows.toDF("vec_id", "v")
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
  }

  test("drops exactly the constructed duplicates, keeps one per set") {
    val out = SimilarityQueries.semDedup(e, tau = 0.9)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2).sum === 20L, "members must conserve the corpus")
    assert(out.map(_._3).sum === 2L,
      "exactly the identical copy and the near-copy are victims")
    out.foreach { case (c, members, dropped, kept) =>
      assert(members === dropped + kept, s"cluster $c scorecard must add up")
      assert(kept >= 1L, s"cluster $c must keep a representative")
    }
  }

  test("tau above the near-copy cosine keeps it, tau at 1.0 keeps all but the exact copy") {
    val near = SimilarityQueries.semDedup(e, tau = 0.999)
      .as[(Long, Long, Long, Long)].collect()
    assert(near.map(_._3).sum === 1L, "only the exact copy is >= 0.999")
    val all = SimilarityQueries.semDedup(e, tau = 1.5)
      .as[(Long, Long, Long, Long)].collect()
    assert(all.map(_._3).sum === 0L, "an unreachable tau drops nothing")
  }
}
