package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The q37 codebook's fixed-point re-center (order-free quantized mean,
  * constant aggregation state) must train a codebook that ASSIGNS exactly
  * like the exact ordered-fold mean it replaced: the 2^-32 quantization
  * error is orders of magnitude below any cosine gap between competing
  * centroids on real data. A divergence here means the quantization (or a
  * regression in either re-center) moved a centroid enough to flip an
  * assignment — which would silently change q37's results. */
class IvfCodebookSpec extends AnyFunSuite {
  import graft.SparkTestSession.{sfDir, spark}

  test("fixed-point and ordered-fold trained codebooks assign every vector identically") {
    val e = SimilarityQueries.normed(spark, sfDir)
    def assignments(cb: org.apache.spark.sql.DataFrame) =
      SimilarityQueries.assign(e, cb)
        .select("vec_id", "centroid_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = assignments(
      SimilarityQueries.trainedCodebook(e, SimilarityQueries.recenterFold))
    val fixedPoint = assignments(SimilarityQueries.trainedCodebook(e))
    assert(fixedPoint.nonEmpty)
    assert(fixedPoint === exact)
  }
}
