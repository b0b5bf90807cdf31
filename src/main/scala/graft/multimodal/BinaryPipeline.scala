package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Opaque media payload row: binary bytes + typed metadata. */
case class MediaRow(doc_id: Long, payload: Array[Byte], source: String)

/** Output of the per-batch decode pass. */
case class DecodedRow(doc_id: Long, source: String, n_bytes: Int,
                      width: Int, height: Int, checksum: String)

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded in per-partition batches.
  *
  * The Spark-side shape is the real thing: a typed `Dataset[MediaRow]`
  * (binary payload + metadata), `mapPartitions` so expensive decoder state
  * initializes once per partition rather than once per row (the Scala
  * analog of a Pandas-UDF `mapInPandas` batch), and a typed output schema.
  * The decode itself is a STUB: this container has no image/audio codecs,
  * so a deterministic fake (md5 checksum + length-derived dimensions)
  * stands in where a real codec call would go — swap the body of
  * `decodeOne` for the codec and nothing else changes.
  */
object BinaryPipeline {

  /** documents.text re-encoded as an opaque payload (what an image/audio
    * bytes column looks like to the engine). */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id").cast("long").as("doc_id"),
              encode(col("text"), "UTF-8").as("payload"),
              col("source"))
      .as[MediaRow]
  }

  /** Frame sampling over an opaque payload: every `every`-th fixed-size
    * frame (the video/audio rate-sampling op, on bytes). Pure columnar —
    * sequence + explode + binary substring + md5, all codegen'd; no
    * per-row lambda. The stub boundary is only WHAT a frame is (a real
    * container format needs a demuxer to find frame offsets); the
    * slicing, rate-sampling, and per-frame digest plumbing is the real
    * thing and is oracle-checked by q53. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 256,
                  every: Int = 4): org.apache.spark.sql.DataFrame =
    media.toDF()
      .filter(expr("octet_length(payload) > 0"))
      .withColumn("n_frames",
        expr(s"cast(ceil(octet_length(payload) / ${frameBytes}.0) as int)"))
      .select(col("doc_id"), col("payload"),
        explode(expr(s"sequence(0, n_frames - 1, $every)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        expr("cast(octet_length(frame) as int)").as("n_bytes"),
        md5(col("frame")).as("frame_md5"))

  /** Per-partition batch decode. One digest instance per partition — the
    * init-once-per-batch pattern the mapPartitions boundary exists for. */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val checksum = md.digest(r.payload).map("%02x".format(_)).mkString
        // STUB decode: deterministic fake dimensions derived from payload
        // length; a real codec would parse r.payload here.
        DecodedRow(
          doc_id = r.doc_id,
          source = r.source,
          n_bytes = r.payload.length,
          width = 64 + r.payload.length % 512,
          height = 64 + (r.payload.length * 7) % 512,
          checksum = checksum)
      }
    }
  }

  /** Output of the resize pass: original + target geometry and the
    * resampled image's digest. */
  case class ResizedRow(doc_id: Long, width: Int, height: Int,
                        target_w: Int, target_h: Int, resized_checksum: String)

  /** Batch resize over decoded frames — the normalize-geometry pass every
    * image pipeline runs before feature extraction. Same init-once
    * mapPartitions shape as [[decode]]; the resample itself is the STUB
    * boundary (no codecs in this container): the fake output digest is a
    * deterministic function of (source checksum, target geometry), which
    * is exactly the cache key a real resampler's output would be indexed
    * by — swap `fakeResample` for the interpolation call and the
    * plumbing, schema, and batch shape stay. */
  def resize(ds: Dataset[DecodedRow], targetW: Int, targetH: Int): Dataset[ResizedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def fakeResample(checksum: String): String = {
        md.reset()
        md.digest(s"${checksum}_${targetW}x$targetH".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
      rows.map { r =>
        ResizedRow(r.doc_id, r.width, r.height, targetW, targetH,
          fakeResample(r.checksum))
      }
    }
  }

  /** A media-derived embedding row — the SAME (id, float-vector) shape as
    * the `embeddings` fixture table, so extracted features flow directly
    * into the similarity operators (cosine top-k, LSH, IVF/PQ). */
  case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Batch feature extraction: payload bytes → fixed-width float vector.
    * The encoder call is the STUB boundary (a real pipeline runs an ONNX/
    * vision model per batch — init-once state is exactly what this
    * mapPartitions carries); the deterministic fake derives unit-range
    * floats from chained md5 of the payload, so downstream geometry is
    * non-degenerate (nonzero norms, distinct directions) and the
    * media → embedding → ANN composition is testable end to end
    * (MultimodalSpec runs extracted features through the graft_dot cosine
    * path). */
  def featureExtract(ds: Dataset[MediaRow], dim: Int = 64): Dataset[MediaEmbedding] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val vec = new Array[Float](dim)
        var block = r.payload
        var i = 0
        while (i < dim) {
          if (i % 16 == 0) { md.reset(); block = md.digest(block) }
          vec(i) = ((block(i % 16) & 0xff) - 128) / 128.0f
          i += 1
        }
        MediaEmbedding(r.doc_id, vec)
      }
    }
  }
}
