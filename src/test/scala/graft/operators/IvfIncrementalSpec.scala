package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q308's incremental-maintenance contract: assigning only the delta batch
  * against the frozen base-corpus codebook and unioning with the staged
  * base assignment equals the one-shot full rebuild — and a constructed
  * delta batch routes exactly where its source vectors already live. */
class IvfIncrementalSpec extends AnyFunSuite {

  private def collectState(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("registered q308 == one-shot full rebuild of the assignment") {
    val base = SimilarityQueries.normed(spark, sfDir).filter(col("vec_id") % 10 =!= 7)
    val frozen = SimilarityQueries.trainedCodebook(
      base, trainSampleMod = SimilarityQueries.ivfTrainSampleMod)
    val rebuilt = SimilarityQueries
      .assign(SimilarityQueries.normed(spark, sfDir), frozen)
      .withColumn("is_new", expr("case when vec_id % 10 = 7 then 1L else 0L end"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).cast("bigint").as("n_vectors"),
        sum("is_new").cast("bigint").as("n_new"),
        coalesce(min(when(col("is_new") === 1L, col("vec_id"))), lit(-1L))
          .cast("bigint").as("first_new_vec"))
      .select(col("centroid_id").cast("bigint"), col("n_vectors"),
        col("n_new"), col("first_new_vec"))
      .orderBy("centroid_id")
    val inc = SimilarityQueries.q308IvfIncremental(spark, sfDir)
    val (a, b) = (collectState(inc), collectState(rebuilt))
    assert(a == b && a.nonEmpty)
    assert(a.map(_._3).sum > 0, "the fixture split must produce a non-empty delta")
  }

  test("a constructed delta batch routes to its source vectors' buckets via the frozen codebook") {
    val base = SimilarityQueries.normed(spark, sfDir).filter(col("vec_id") % 10 =!= 7)
    val frozen = SimilarityQueries.trainedCodebook(
      base, trainSampleMod = SimilarityQueries.ivfTrainSampleMod)
    val baseAssigned = SimilarityQueries.assign(base, frozen)
      .select(col("vec_id"), col("centroid_id"))
    // the delta: exact copies of 20 standing vectors under fresh ids — a
    // re-crawl of known content, the adversarial delta for routing drift
    val delta = base.filter(col("vec_id") < 40)
      .select((col("vec_id") + 10000L).as("vec_id"), col("v"), col("nrm"))
    val deltaAssigned = SimilarityQueries.assign(delta, frozen)
      .select((col("vec_id") - 10000L).as("vec_id"),
        col("centroid_id").as("delta_centroid"))
    val drifted = baseAssigned.join(deltaAssigned, "vec_id")
      .filter(col("centroid_id") =!= col("delta_centroid"))
    assert(deltaAssigned.count() > 0 && drifted.count() == 0,
      "identical vectors must route to identical buckets under the frozen codebook")
  }

  test("the standing codebook is frozen: delta arrival does not move centroids") {
    val base = SimilarityQueries.normed(spark, sfDir).filter(col("vec_id") % 10 =!= 7)
    val frozen = SimilarityQueries.trainedCodebook(
      base, trainSampleMod = SimilarityQueries.ivfTrainSampleMod)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    // deterministic retrain on the same base == the staged artifact; the
    // delta never enters the training set by construction
    val again = SimilarityQueries.trainedCodebook(
      base, trainSampleMod = SimilarityQueries.ivfTrainSampleMod)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    assert(frozen.length == again.length && frozen.zip(again).forall {
      case ((i1, v1, n1), (i2, v2, n2)) => i1 == i2 && v1 == v2 && n1 == n2
    })
  }
}
