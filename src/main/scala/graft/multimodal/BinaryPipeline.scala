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
}
