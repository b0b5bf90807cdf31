package graft.operators

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** The LSH hot-bucket cap (DedupQueries.bucketPairs maxBucketSize): buckets
  * over the cap are dropped AND the drop count is observable — recall loss
  * from skew control must never be silent. */
class BucketCapSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark

  test("oversized buckets are dropped and counted via the named observation") {
    import spark.implicits._
    val bands = Seq(
      (0, "hot", 1L), (0, "hot", 2L), (0, "hot", 3L), // size 3: over cap
      (0, "ok", 4L), (0, "ok", 5L),                   // size 2: kept
      (1, "solo", 6L)                                 // size 1: never pairs
    ).toDF("band", "bkey", "id")

    @volatile var dropped: Option[Long] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("graft_lsh_bucket_cap")
          .foreach(r => dropped = Some(r.getLong(0)))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val pairs = DedupQueries.bucketPairs(bands, "id", "a", "b", Some(2)).collect()
      assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((4L, 5L)))
      // QueryExecutionListener delivery is async
      val deadline = System.currentTimeMillis() + 10000
      while (dropped.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(dropped.contains(1L), s"expected 1 dropped bucket observed, got $dropped")
    } finally spark.listenerManager.unregister(listener)

    // without a cap the hot bucket expands normally and nothing is observed
    val all = DedupQueries.bucketPairs(bands, "id", "a", "b").collect()
    assert(all.length === 4) // 3 pairs from "hot" + 1 from "ok"
  }
}
