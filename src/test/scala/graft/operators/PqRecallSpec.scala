package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Recall of the PQ code + ADC-shortlist + exact-rerank search against
  * q25's exact baseline — like IvfRecallSpec, the check the oracle hash
  * cannot perform (the DuckDB twin mirrors the same approximation).
  *
  *   - the registered (m=16, k=32, shortlist=16) instance must clear a
  *     recall@3 floor;
  *   - the rerank must beat raw ADC at the same geometry (the shortlist
  *     stage is what makes an untrained codebook usable);
  *   - widening the shortlist must not lose recall (monotone), and a
  *     corpus-wide shortlist makes the "approximation" exact.
  */
class PqRecallSpec extends AnyFunSuite {
  import graft.SparkTestSession.{spark, sfDir}

  private def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private lazy val exact = neighbors(SimilarityQueries.q25CosineTopk(spark, sfDir))

  private def recallAt3(approx: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (p, truth) =>
      approx.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("the registered q71 geometry clears the recall@3 floor") {
    val r = recallAt3(neighbors(SimilarityQueries.q71PqTopk(spark, sfDir)))
    assert(r >= 0.8, s"recall@3 was $r, expected >= 0.8")
  }

  test("exact rerank beats raw ADC at the same geometry") {
    val adc = recallAt3(neighbors(SimilarityQueries.pqTopk(spark, sfDir, 16, 32, 0)))
    val rr = recallAt3(neighbors(SimilarityQueries.pqTopk(spark, sfDir, 16, 32, 16)))
    assert(rr > adc, s"rerank ($rr) must beat raw ADC ($adc)")
  }

  test("per-subspace Lloyd training lifts raw-ADC recall over the untrained seed") {
    val untrained = recallAt3(neighbors(
      SimilarityQueries.pqTopk(spark, sfDir, 16, 32, 0, trainIters = 0)))
    val trained = recallAt3(neighbors(
      SimilarityQueries.pqTopk(spark, sfDir, 16, 32, 0)))
    assert(trained > untrained,
      s"trained raw-ADC recall ($trained) must beat the untrained seed ($untrained)")
  }

  test("sampled training (the 100 TB index-build lever) keeps full-training recall") {
    // the 2000-vector sf0.1 corpus: a 1-in-4 sample plus the 32-seed union
    // is ~530 training members for 32 centroids per subspace — the regime
    // where sampling is non-degenerate (on a tiny fixture every seed
    // self-assigns at distance 0 and sampling reduces to the seed, which
    // is exactly what the earlier revert documented). Raw ADC (shortlist
    // 0) so the rerank can't mask a codebook difference.
    val dir = "/root/testdata/sf0.1"
    val exactBig = neighbors(SimilarityQueries.q25CosineTopk(spark, dir))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exactBig.map { case (p, truth) =>
        approx.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      per.sum / per.size
    }
    val untrained = recall(neighbors(
      SimilarityQueries.pqTopk(spark, dir, 16, 32, 0, trainIters = 0)))
    val full = recall(neighbors(
      SimilarityQueries.pqTopk(spark, dir, 16, 32, 0)))
    val sampled = recall(neighbors(
      SimilarityQueries.pqTopk(spark, dir, 16, 32, 0, trainSampleMod = 4)))
    assert(sampled > untrained,
      s"sampled-training recall ($sampled) must still lift over the untrained seed ($untrained)")
    assert(sampled >= full - 0.1,
      s"sampled-training recall ($sampled) must stay within 0.1 of full training ($full)")
  }

  test("recall is monotone in shortlist width; a corpus-wide shortlist is exact") {
    val r8 = recallAt3(neighbors(SimilarityQueries.pqTopk(spark, sfDir, 16, 32, 8)))
    val r16 = recallAt3(neighbors(SimilarityQueries.pqTopk(spark, sfDir, 16, 32, 16)))
    val r32 = recallAt3(neighbors(SimilarityQueries.pqTopk(spark, sfDir, 16, 32, 32)))
    assert(r8 <= r16 && r16 <= r32, s"recall must widen with the shortlist: $r8 / $r16 / $r32")
    val all = SimilarityQueries.pqTopk(spark, sfDir, 16, 32, 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ex = SimilarityQueries.q25CosineTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(all.toSeq === ex.toSeq)
  }
}
