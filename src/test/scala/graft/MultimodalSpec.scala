package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing beyond the oracle-checked columnar parts
  * (q29 binary metadata, q53 frame sampling): batch resize and feature
  * extraction, and the media → embedding → ANN composition. The decode/
  * resample/encode bodies are documented stubs; what these tests pin is
  * everything AROUND them — schemas, determinism, batch shape, and that
  * extracted features are genuinely consumable by the similarity
  * operators. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}
  import graft.multimodal.BinaryPipeline

  private lazy val media = BinaryPipeline.mediaFromDocuments(spark, sfDir)

  test("resize emits one row per decoded frame with the target geometry, deterministically") {
    val decoded = BinaryPipeline.decode(media)
    val a = BinaryPipeline.resize(decoded, 224, 224).collect()
    val b = BinaryPipeline.resize(BinaryPipeline.decode(media), 224, 224).collect()
    assert(a.length === decoded.count())
    assert(a.forall(r => r.target_w == 224 && r.target_h == 224))
    assert(a.sortBy(_.doc_id).toSeq === b.sortBy(_.doc_id).toSeq,
      "the resample digest must be a pure function of (input, geometry)")
    // distinct inputs must not collapse to one resized digest
    assert(a.map(_.resized_checksum).distinct.length > 1)
  }

  test("feature extraction yields embedding-shaped vectors with sane geometry") {
    val feats = BinaryPipeline.featureExtract(media, dim = 64)
    val df = feats.toDF()
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    val norms = df.select("nrm").collect().map(_.getDouble(0))
    assert(norms.length === media.count())
    assert(norms.forall(n => n > 0.0 && !n.isNaN), "no degenerate vectors")
  }

  test("media -> features -> cosine top-k composes end to end") {
    val feats = BinaryPipeline.featureExtract(media, dim = 64).toDF()
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      .select("doc_id", "v", "nrm")
    val probes = feats.limit(4)
      .select(col("doc_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val topk = feats.join(broadcast(probes), col("doc_id") =!= col("probe_id"))
      .withColumn("cos", expr("graft_dot(pv, v) / (pn * nrm)"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("probe_id").orderBy(desc("cos"), asc("doc_id"))))
      .filter(col("rank") <= 3)
    val rows = topk.collect()
    assert(rows.length === 4 * 3)
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-9))
  }
}
