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
