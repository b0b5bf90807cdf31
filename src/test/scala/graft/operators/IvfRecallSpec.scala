package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Recall of the IVF approximate top-k against q25's exact baseline — the
  * check the oracle hash cannot perform: the DuckDB twin mirrors the same
  * approximation, so both could be "identically wrong". Here the exact
  * scan is the referee.
  *
  *   - nprobe=1 (the q37 form) must clear a recall@3 floor on the
  *     fixtures — a codebook regression (e.g. Lloyd collapsing centroids)
  *     drops recall long before it breaks the hash;
  *   - widening nprobe must never lose a true neighbor (monotone);
  *   - nprobe=16 searches every bucket, so the "approximation" must equal
  *     the exact baseline row-for-row — proving the bucket decomposition
  *     is lossless and recall loss comes only from probing fewer buckets.
  */
class IvfRecallSpec extends AnyFunSuite {
  import graft.SparkTestSession.{spark, sfDir}

  private def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private lazy val exact = neighbors(SimilarityQueries.q25CosineTopk(spark, sfDir))

  private def recallAt3(approx: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (p, truth) =>
      approx.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("nprobe=1 recall@3 clears the floor") {
    val r = recallAt3(neighbors(SimilarityQueries.ivfTopk(spark, sfDir, nprobe = 1)))
    assert(r >= 0.6, s"recall@3 at nprobe=1 was $r, expected >= 0.6")
  }

  test("recall is monotone in nprobe") {
    val r1 = recallAt3(neighbors(SimilarityQueries.ivfTopk(spark, sfDir, nprobe = 1)))
    val r2 = recallAt3(neighbors(SimilarityQueries.ivfTopk(spark, sfDir, nprobe = 2)))
    val r4 = recallAt3(neighbors(SimilarityQueries.ivfTopk(spark, sfDir, nprobe = 4)))
    assert(r1 <= r2 && r2 <= r4, s"recall must widen with nprobe: $r1 / $r2 / $r4")
  }

  test("nprobe=16 (all buckets) equals the exact baseline row-for-row") {
    val all = SimilarityQueries.ivfTopk(spark, sfDir, nprobe = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ex = SimilarityQueries.q25CosineTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(all.toSeq === ex.toSeq)
  }
}
