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
  * IMAGE payloads decode for real since round 9 — `javax.imageio` ships
  * PNG/JPEG/GIF/BMP readers in the JDK, so geometry, resampling, and
  * block-mean features all run over actual pixels. AUDIO payloads decode
  * for real since round 10 — `javax.sound.sampled` ships WAV/AU/AIFF
  * PCM readers in the JDK, so sample rate, frame counts, peak/mean
  * amplitude, and block-energy features all run over actual samples.
  * VIDEO demuxes for real since round 11 — a hand-rolled parser for two
  * genuinely self-describing containers: Y4M (YUV4MPEG2, ffmpeg's raw
  * interchange format: text header + FRAME-delimited planar YUV) and
  * AVI with MJPEG frames (a RIFF chunk walk to the `movi` list; every
  * `..dc` chunk is a standalone JPEG the JDK's ImageIO decodes) — so
  * frame counts, geometry, rate sampling, and per-frame luma statistics
  * all run over actual frames. The stub boundary has shrunk to
  * compressed inter-frame codecs (H.264 etc.) and compressed audio,
  * where a deterministic fake (md5 checksum + length-derived
  * dimensions) stands in — swap it for the codec call and nothing else
  * changes.
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

  /** Real image decode for payloads a JDK-built-in codec accepts
    * (javax.imageio ships PNG/JPEG/GIF/BMP readers — no external
    * dependency). None for everything else: the synthetic text-derived
    * fixtures and genuine audio/video payloads (whose demuxers really
    * are absent from this container) fall back to the documented
    * deterministic fake, so fixture hashes are unchanged while a real
    * PNG flows through actual pixel decode (MultimodalSpec proves both
    * paths). ImageIO sniffs magic bytes before committing to a reader,
    * so the non-image rejection is a cheap header check. */
  private def tryDecodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Per-partition batch decode. One digest instance per partition — the
    * init-once-per-batch pattern the mapPartitions boundary exists for.
    * Decodable images report their REAL geometry; other payloads keep
    * the length-derived fake (stub boundary documented above). */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val checksum = md.digest(r.payload).map("%02x".format(_)).mkString
        val (w, h) = tryDecodeImage(r.payload) match {
          case Some(img) => (img.getWidth, img.getHeight)
          case None => (64 + r.payload.length % 512,
                        64 + (r.payload.length * 7) % 512)
        }
        DecodedRow(
          doc_id = r.doc_id,
          source = r.source,
          n_bytes = r.payload.length,
          width = w,
          height = h,
          checksum = checksum)
      }
    }
  }

  /** Real audio decode for payloads a JDK-built-in codec accepts
    * (javax.sound.sampled ships WAV/AU/AIFF PCM readers — no external
    * dependency). Returns the format plus the raw PCM frame bytes;
    * None for everything else (AudioSystem sniffs container headers
    * before committing, so non-audio rejection is a cheap check). */
  private def tryDecodeAudio(
      payload: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try Some((in.getFormat, in.readAllBytes()))
      finally in.close()
    } catch { case _: Exception => None }

  /** Signed 16-bit PCM samples (channel-interleaved) from decoded frame
    * bytes, or None when the format is not 16-bit integer PCM — the one
    * layout the sample-level math below handles. */
  private def pcm16Samples(fmt: javax.sound.sampled.AudioFormat,
                           frames: Array[Byte]): Option[Array[Int]] = {
    val enc = fmt.getEncoding
    if (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || frames.length < 2) None
    else {
      val n = frames.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val (b0, b1) = (frames(2 * i) & 0xff, frames(2 * i + 1) & 0xff)
        out(i) = (if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
        i += 1
      }
      Some(out)
    }
  }

  /** Typed audio decode row: real sample-level facts for decodable
    * PCM payloads, the documented deterministic fake otherwise. */
  case class AudioRow(doc_id: Long, source: String, n_bytes: Int,
                      sample_rate: Int, channels: Int, bits_per_sample: Int,
                      n_frames: Long, duration_ms: Long,
                      peak_abs: Int, mean_abs_e6: Long, decoded: Boolean)

  /** Per-partition batch audio decode — the audio twin of [[decode]].
    * A WAV/AU/AIFF payload reports its REAL format and exact integer
    * sample statistics (peak and mean absolute amplitude over all
    * channels — mean is e6-quantized via integer division, so the row
    * is bit-stable across platforms). Non-audio payloads keep the
    * length-derived fake with `decoded = false`, so downstream schemas
    * stay total without pretending the codec ran. */
  def decodeAudio(ds: Dataset[MediaRow]): Dataset[AudioRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val real = for {
          (fmt, frames) <- tryDecodeAudio(r.payload)
          samples <- pcm16Samples(fmt, frames)
        } yield {
          var peak = 0; var sumAbs = 0L
          var i = 0
          while (i < samples.length) {
            val a = math.abs(samples(i))
            if (a > peak) peak = a
            sumAbs += a
            i += 1
          }
          val nFrames = samples.length.toLong / math.max(1, fmt.getChannels)
          AudioRow(r.doc_id, r.source, r.payload.length,
            fmt.getSampleRate.toInt, fmt.getChannels, fmt.getSampleSizeInBits,
            nFrames,
            nFrames * 1000L / math.max(1, fmt.getSampleRate.toInt),
            peak, sumAbs * 1000000L / math.max(1, samples.length),
            decoded = true)
        }
        real.getOrElse(
          AudioRow(r.doc_id, r.source, r.payload.length,
            8000 + r.payload.length % 8000, 1 + r.payload.length % 2, 16,
            r.payload.length.toLong / 2,
            (r.payload.length.toLong / 2) * 1000L /
              (8000 + r.payload.length % 8000),
            0, 0L, decoded = false))
      }
    }
  }

  /** One demuxed video frame: geometry plus the raw 8-bit luma plane
    * (BT.601 integer luma for decoded-RGB sources, the native Y plane
    * for planar-YUV sources — the same quantity either way). */
  private[multimodal] final case class VideoFrame(width: Int, height: Int,
                                                  luma: Array[Byte])

  /** BT.601 integer luma plane of a decoded image — shared by the image
    * block-mean path and the MJPEG frame path so both quantize pixels
    * identically: (299R + 587G + 114B) / 1000, integer throughout. */
  private def lumaOfImage(img: java.awt.image.BufferedImage): VideoFrame = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        out(y * w + x) = ((299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff)
          + 114 * (p & 0xff)) / 1000).toByte
        x += 1
      }
      y += 1
    }
    VideoFrame(w, h, out)
  }

  /** Y4M (YUV4MPEG2) demux: ASCII stream header `YUV4MPEG2 W<w> H<h>
    * F<n>:<d> ... C<fmt>\n`, then per frame an ASCII `FRAME...\n` marker
    * followed by the raw planar YUV bytes — luma plane first, which is
    * exactly what the frame statistics need, no color conversion at all.
    * Supports the C420 family (default), C422, C444, and Cmono chroma
    * layouts (they only change how many chroma bytes to SKIP per frame).
    * None for anything that is not a well-formed Y4M stream. */
  private def tryDemuxY4m(p: Array[Byte]): Option[Vector[VideoFrame]] =
    try {
      val magic = "YUV4MPEG2"
      if (p.length < magic.length + 1 ||
          !p.take(magic.length).sameElements(magic.getBytes("US-ASCII")))
        return None
      def lineEnd(from: Int): Int = {
        var i = from
        while (i < p.length && p(i) != '\n') i += 1
        i
      }
      val hEnd = lineEnd(0)
      if (hEnd >= p.length) return None
      val params = new String(p, 0, hEnd, "US-ASCII").split(' ').drop(1)
      var w = -1; var h = -1; var chroma = "420"
      params.foreach { t =>
        if (t.startsWith("W")) w = t.drop(1).toInt
        else if (t.startsWith("H")) h = t.drop(1).toInt
        else if (t.startsWith("C")) chroma = t.drop(1)
      }
      if (w <= 0 || h <= 0) return None
      val chromaBytes =
        if (chroma.startsWith("420")) 2 * ((w + 1) / 2) * ((h + 1) / 2)
        else if (chroma.startsWith("422")) 2 * ((w + 1) / 2) * h
        else if (chroma.startsWith("444")) 2 * w * h
        else if (chroma == "mono") 0
        else return None
      val frameMagic = "FRAME".getBytes("US-ASCII")
      val frames = Vector.newBuilder[VideoFrame]
      var pos = hEnd + 1
      while (pos < p.length) {
        if (pos + frameMagic.length > p.length ||
            !java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(p, pos, pos + frameMagic.length),
              frameMagic)) return None
        val fEnd = lineEnd(pos)
        if (fEnd >= p.length) return None
        val dataStart = fEnd + 1
        if (dataStart + w * h + chromaBytes > p.length) return None
        frames += VideoFrame(w, h,
          java.util.Arrays.copyOfRange(p, dataStart, dataStart + w * h))
        pos = dataStart + w * h + chromaBytes
      }
      val out = frames.result()
      if (out.isEmpty) None else Some(out)
    } catch { case _: Exception => None }

  /** AVI/MJPEG demux: RIFF('AVI ') chunk walk. Chunks are
    * (fourcc, le32 size, payload, even-pad); the frames live in the
    * LIST('movi') — every `..dc` sub-chunk (optionally nested inside
    * LIST('rec ') groups) is a standalone JPEG that ImageIO decodes
    * (JPEG ships in the JDK), converted to the shared BT.601 luma
    * plane. Header lists (hdrl/strl) are skipped — each MJPEG frame is
    * self-describing, so the demux needs no stream-format chunk. None
    * for non-AVI payloads or AVIs whose frames no JDK codec accepts
    * (e.g. H.264 in AVI) — the documented compressed-codec boundary. */
  private def tryDemuxAvi(p: Array[Byte]): Option[Vector[VideoFrame]] =
    try {
      if (p.length < 12) return None
      def fourcc(at: Int) = new String(p, at, 4, "US-ASCII")
      def le32(at: Int): Int =
        (p(at) & 0xff) | ((p(at + 1) & 0xff) << 8) |
          ((p(at + 2) & 0xff) << 16) | ((p(at + 3) & 0xff) << 24)
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      val frames = Vector.newBuilder[VideoFrame]
      def scanChunks(from: Int, until: Int, inMovi: Boolean): Unit = {
        var pos = from
        while (pos + 8 <= until) {
          val id = fourcc(pos)
          val size = le32(pos + 4)
          if (size < 0 || pos + 8 + size > until) return
          if (id == "LIST" && size >= 4) {
            val listType = fourcc(pos + 8)
            scanChunks(pos + 12, pos + 8 + size,
              inMovi || listType == "movi" || listType == "rec ")
          } else if (inMovi && id.endsWith("dc") && size > 0) {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
              java.util.Arrays.copyOfRange(p, pos + 8, pos + 8 + size)))
            if (img != null) frames += lumaOfImage(img)
          }
          pos += 8 + size + (size & 1)
        }
      }
      scanChunks(12, math.min(p.length, 8 + le32(4)), inMovi = false)
      val out = frames.result()
      if (out.isEmpty) None else Some(out)
    } catch { case _: Exception => None }

  /** Demux a video payload into its luma-plane frames, or None when the
    * container is neither Y4M nor a JDK-decodable AVI. */
  private[multimodal] def demuxVideo(p: Array[Byte]): Option[Vector[VideoFrame]] =
    tryDemuxY4m(p).orElse(tryDemuxAvi(p))

  /** Typed per-frame video decode row: real geometry and exact integer
    * luma statistics for demuxable payloads; the q53-shaped fixed-size
    * byte-slice fake (width/height 0, `decoded = false`) otherwise, so
    * downstream schemas stay total without pretending a codec ran. */
  case class VideoFrameRow(doc_id: Long, frame_idx: Int, width: Int,
                           height: Int, n_bytes: Int, mean_luma: Int,
                           frame_md5: String, decoded: Boolean)

  /** Per-partition batch video decode + RATE SAMPLING — the video twin
    * of [[decode]]/[[decodeAudio]]: demux, keep every `every`-th frame,
    * and emit exact integer per-frame facts (mean luma is an integer
    * division over the full plane; the digest covers the raw luma
    * bytes, so rows are bit-stable across platforms). The mapPartitions
    * boundary carries the once-per-batch decoder state exactly where a
    * real codec's native context would live. */
  def decodeVideo(ds: Dataset[MediaRow], every: Int = 1): Dataset[VideoFrameRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
      rows.flatMap { r =>
        demuxVideo(r.payload) match {
          case Some(frames) =>
            frames.zipWithIndex.collect {
              case (f, i) if i % every == 0 =>
                var sum = 0L
                var j = 0
                while (j < f.luma.length) { sum += f.luma(j) & 0xff; j += 1 }
                md.reset()
                VideoFrameRow(r.doc_id, i, f.width, f.height, f.luma.length,
                  (sum / math.max(1, f.luma.length)).toInt,
                  hex(md.digest(f.luma)), decoded = true)
            }
          case None =>
            val frameBytes = 256
            val n = (r.payload.length + frameBytes - 1) / frameBytes
            (0 until n by every).map { i =>
              val from = i * frameBytes
              val until = math.min(from + frameBytes, r.payload.length)
              val slice = java.util.Arrays.copyOfRange(r.payload, from, until)
              var sum = 0L
              var j = 0
              while (j < slice.length) { sum += slice(j) & 0xff; j += 1 }
              md.reset()
              VideoFrameRow(r.doc_id, i, 0, 0, slice.length,
                (sum / math.max(1, slice.length)).toInt,
                hex(md.digest(slice)), decoded = false)
            }
        }
      }
    }
  }

  /** 64-bit AVERAGE HASH (aHash) of a luma plane — the classic
    * perceptual near-dup fingerprint for images (an 8x8 grid of block
    * means thresholded at their own mean; near-identical images differ
    * in a few bits, unrelated images in ~32): integer block means over
    * the same bounds arithmetic as [[blockMeanInto]] (so the hash and
    * the feature vector quantize pixels identically), global mean =
    * floor of the block-mean average, bit j set iff block j is
    * STRICTLY brighter than the mean. Banded hamming-distance joins
    * over this hash are exactly q23/q42's simhash machinery — the
    * image near-dup pipeline is those operators pointed at this
    * column. */
  private[multimodal] def aHashOfFrame(f: VideoFrame): Long = {
    val g = 8
    val (w, h) = (f.width, f.height)
    val means = new Array[Long](g * g)
    var cy = 0
    while (cy < g) {
      var cx = 0
      while (cx < g) {
        val (x0, x1) = (cx * w / g, math.max((cx + 1) * w / g, cx * w / g + 1))
        val (y0, y1) = (cy * h / g, math.max((cy + 1) * h / g, cy * h / g + 1))
        var sum = 0L; var n = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            sum += f.luma(y * w + x) & 0xff; n += 1; x += 1
          }
          y += 1
        }
        means(cy * g + cx) = if (n > 0) sum / n else 0L
        cx += 1
      }
      cy += 1
    }
    val mean = means.sum / (g * g)
    var bits = 0L
    var i = 0
    while (i < g * g) {
      if (means(i) > mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Per-document perceptual hash: real pixels when a JDK codec decodes
    * the payload (still image, or frame 0 of a demuxed video — the
    * thumbnail convention), otherwise the documented deterministic
    * fallback (first 16 md5 hex digits as a long — content-stable, so
    * EXACT payload dupes still collide; near-dup geometry only exists
    * on the real-pixel path). */
  case class AHashRow(doc_id: Long, source: String, ahash: Long, real: Boolean)

  def perceptualHash(ds: Dataset[MediaRow]): Dataset[AHashRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val frame = tryDecodeImage(r.payload).map(lumaOfImage)
          .orElse(demuxVideo(r.payload).map(_.head))
        frame match {
          case Some(f) => AHashRow(r.doc_id, r.source, aHashOfFrame(f), real = true)
          case None =>
            val hex = java.security.MessageDigest.getInstance("MD5")
              .digest(r.payload).take(8)
            AHashRow(r.doc_id, r.source,
              java.nio.ByteBuffer.wrap(hex).getLong, real = false)
        }
      }
    }
  }

  /** Synthesize a SINGLE-FRAME 8×8 Y4M "thumbnail" per document: pixel i
    * (row-major, i = 0..63) carries code point i's luma (cp % 256), with
    * space (32) padding past the end of short texts. The q260 synthesis
    * discipline pointed at [[perceptualHash]]: because [[aHashOfFrame]]'s
    * 8×8 grid over an 8×8 plane makes every block mean exactly one pixel,
    * the aHash bits are pure integer arithmetic on character codes — so a
    * DuckDB twin re-derives the full 64-bit fingerprint from the text
    * alone and the Y4M round-trip + demux + hash all sit under the hash
    * gate. Code-point semantics (not UTF-16 units) to match the twin's
    * substr/ascii. Per-partition batch, no shuffle. */
  def imageMediaFromText(docs: org.apache.spark.sql.DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.selectExpr("doc_id", "source", "text")
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, src, text) =>
          val bos = new java.io.ByteArrayOutputStream()
          bos.write("YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
          bos.write("FRAME\n".getBytes("US-ASCII"))
          val luma = new Array[Byte](64)
          java.util.Arrays.fill(luma, 32.toByte)
          val cps = text.codePoints().toArray
          var i = 0
          while (i < math.min(64, cps.length)) {
            luma(i) = (cps(i) % 256).toByte
            i += 1
          }
          bos.write(luma)
          bos.write(new Array[Byte](2 * 4 * 4)) // constant 4:2:0 chroma planes
          MediaRow(id, bos.toByteArray, src)
        }
      }
  }

  /** Output of the resize pass: original + target geometry and the
    * resampled image's digest. */
  case class ResizedRow(doc_id: Long, width: Int, height: Int,
                        target_w: Int, target_h: Int, resized_checksum: String)

  /** Batch resize — the normalize-geometry pass every image pipeline runs
    * before feature extraction. Same init-once mapPartitions shape as
    * [[decode]]. A decodable image is resampled FOR REAL: deterministic
    * nearest-neighbor over the decoded pixel grid (integer source-index
    * arithmetic — Java2D's interpolating drawImage is platform-varying,
    * so the resampler is hand-rolled for bit-stable digests), and the
    * output digest covers the resampled ARGB bytes. Non-image payloads
    * keep the documented fake: a digest of (payload checksum, geometry) —
    * exactly the cache key a real resampler's output would be indexed
    * by. MultimodalSpec pins the real path against an expected
    * pixel-byte digest. */
  def resize(ds: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
      rows.map { r =>
        md.reset()
        val payloadSum = hex(md.digest(r.payload))
        tryDecodeImage(r.payload) match {
          case Some(img) =>
            val (sw, sh) = (img.getWidth, img.getHeight)
            val out = new Array[Byte](4)
            md.reset()
            var y = 0
            while (y < targetH) {
              var x = 0
              while (x < targetW) {
                // integer nearest-neighbor source index; ARGB big-endian
                val p = img.getRGB(x * sw / targetW, y * sh / targetH)
                out(0) = (p >>> 24).toByte; out(1) = (p >>> 16).toByte
                out(2) = (p >>> 8).toByte; out(3) = p.toByte
                md.update(out)
                x += 1
              }
              y += 1
            }
            ResizedRow(r.doc_id, sw, sh, targetW, targetH, hex(md.digest()))
          case None =>
            md.reset()
            val fake = hex(md.digest(
              s"${payloadSum}_${targetW}x$targetH".getBytes("UTF-8")))
            ResizedRow(r.doc_id, 64 + r.payload.length % 512,
              64 + (r.payload.length * 7) % 512, targetW, targetH, fake)
        }
      }
    }
  }

  /** A media-derived embedding row — the SAME (id, float-vector) shape as
    * the `embeddings` fixture table, so extracted features flow directly
    * into the similarity operators (cosine top-k, LSH, IVF/PQ). */
  case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Batch feature extraction: payload bytes → fixed-width float vector.
    * A decodable image yields REAL pixel features: the image is cut into
    * a g x g grid (g = floor(sqrt(dim))) and each cell contributes its
    * mean integer luminance (BT.601 integer luma: (299R + 587G + 114B) /
    * 1000) scaled to [-1, 1) — the classic block-mean visual descriptor,
    * fully integer until the final scale so it is bit-stable across
    * platforms. Any dims past g*g repeat the global mean. A decodable
    * PCM AUDIO payload yields real sample features instead: the
    * interleaved sample stream splits into `dim` equal time blocks and
    * each block contributes its mean absolute amplitude scaled to
    * [0, 1) — the block-energy envelope descriptor, fully integer
    * until the final scale. Other payloads keep the documented stub: a
    * real pipeline runs an ONNX model per batch (init-once state is
    * exactly what this mapPartitions carries), and the deterministic
    * md5-chain fake stands in so downstream geometry is non-degenerate
    * and the media → embedding → ANN composition stays testable end to
    * end (MultimodalSpec runs all three paths through the graft_dot
    * cosine path, and checks the real paths' block stats against a
    * known-geometry PNG and a known-amplitude WAV). */
  /** g x g block-mean luma grid over a raw luma plane, written into
    * `vec` scaled to [-1, 1); dims past g*g repeat the global mean.
    * Shared by the image path (via [[lumaOfImage]]) and the video path
    * (frame 0's plane), so both quantize identically. Fully integer
    * until the final scale — bit-stable across platforms. */
  private def blockMeanInto(f: VideoFrame, dim: Int, vec: Array[Float]): Unit = {
    val (w, h) = (f.width, f.height)
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    var globalSum = 0L; var globalN = 0L
    var cy = 0
    while (cy < g) {
      var cx = 0
      while (cx < g) {
        val (x0, x1) = (cx * w / g, math.max((cx + 1) * w / g, cx * w / g + 1))
        val (y0, y1) = (cy * h / g, math.max((cy + 1) * h / g, cy * h / g + 1))
        var sum = 0L; var n = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            sum += f.luma(y * w + x) & 0xff; n += 1; x += 1
          }
          y += 1
        }
        val i = cy * g + cx
        if (i < dim && n > 0) vec(i) = ((sum / n) - 128) / 128.0f
        globalSum += sum; globalN += n
        cx += 1
      }
      cy += 1
    }
    val mean = if (globalN > 0) ((globalSum / globalN) - 128) / 128.0f else 0f
    var i = g * g
    while (i < dim) { vec(i) = mean; i += 1 }
  }

  def featureExtract(ds: Dataset[MediaRow], dim: Int = 64): Dataset[MediaEmbedding] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val vec = new Array[Float](dim)
        tryDecodeImage(r.payload) match {
          case Some(img) =>
            blockMeanInto(lumaOfImage(img), dim, vec)
          case None =>
            val samplesOpt = tryDecodeAudio(r.payload)
              .flatMap { case (fmt, frames) => pcm16Samples(fmt, frames) }
            samplesOpt match {
              case Some(samples) =>
                // block-energy envelope: dim equal time blocks, each the
                // integer mean |amplitude| scaled by 1/32768
                var i = 0
                while (i < dim) {
                  // Long block bounds: i * samples.length overflows Int
                  // past ~33M samples (a ~67 MB PCM payload at dim=64)
                  val s0 = (i.toLong * samples.length / dim).toInt
                  val s1 = math.max(((i + 1).toLong * samples.length / dim).toInt, s0 + 1)
                  var sum = 0L; var n = 0L
                  var j = s0
                  while (j < math.min(s1, samples.length)) {
                    sum += math.abs(samples(j)); n += 1; j += 1
                  }
                  vec(i) = if (n > 0) (sum / n) / 32768.0f else 0f
                  i += 1
                }
              case None =>
                demuxVideo(r.payload) match {
                  case Some(frames) =>
                    // key-frame visual descriptor: frame 0's block-mean
                    // luma grid — the thumbnail convention, identical
                    // quantization to the still-image path
                    blockMeanInto(frames.head, dim, vec)
                  case None =>
                    var block = r.payload
                    var i = 0
                    while (i < dim) {
                      if (i % 16 == 0) { md.reset(); block = md.digest(block) }
                      vec(i) = ((block(i % 16) & 0xff) - 128) / 128.0f
                      i += 1
                    }
                }
            }
        }
        MediaEmbedding(r.doc_id, vec)
      }
    }
  }

  /** Per-document video scene detection (q260's engine): frame count,
    * scene count, and longest scene from REAL demuxed luma planes. */
  case class VideoSceneRow(doc_id: Long, source: String, n_frames: Long,
                           n_scenes: Long, longest_scene: Long)

  /** Synthesize a Y4M stream per document (one 8×8 constant-luma frame
    * per character, luma = code % 256), demux it through the REAL Y4M
    * parser, and cut scenes where consecutive frames' mean luma moves
    * by ≥ 8 — the shot-boundary pass a video curation pipeline runs
    * before frame sampling (q53 samples a rate; this finds the cuts).
    * The luma rule is integer arithmetic on character codes, so the
    * DuckDB oracle re-derives every boundary from the text alone and
    * the container round-trip sits under the hash gate (q257's audio
    * discipline applied to video). Per-partition batch, no shuffle. */
  def videoScenes(docs: org.apache.spark.sql.DataFrame)
      : Dataset[VideoSceneRow] = {
    import docs.sparkSession.implicits._
    docs.selectExpr("doc_id", "source", "text")
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, src, text) =>
          val bos = new java.io.ByteArrayOutputStream()
          bos.write("YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
          val chroma = new Array[Byte](2 * 4 * 4)
          // one frame per CODE POINT, not per UTF-16 unit: the DuckDB
          // twin's substr/length/ascii are code-point semantics, so a
          // non-BMP character must be ONE frame here too (charAt would
          // split it into two surrogate frames and diverge the counts)
          val cps = text.codePoints().toArray
          var i = 0
          while (i < cps.length) {
            bos.write("FRAME\n".getBytes("US-ASCII"))
            val luma = new Array[Byte](64)
            java.util.Arrays.fill(luma, (cps(i) % 256).toByte)
            bos.write(luma)
            bos.write(chroma)
            i += 1
          }
          val frames = demuxVideo(bos.toByteArray).getOrElse(
            sys.error(s"doc $id: synthesized Y4M failed to demux"))
          // mean luma of a constant plane IS the char code — but compute
          // it from the DEMUXED bytes so the parser is what's checked
          val lumas = frames.map { f =>
            var s2 = 0L
            var j = 0
            while (j < f.luma.length) { s2 += f.luma(j) & 0xff; j += 1 }
            s2 / f.luma.length
          }
          var (nScenes, longest, run) = (0L, 0L, 0L)
          var k = 0
          while (k < lumas.length) {
            val cut = k == 0 || math.abs(lumas(k) - lumas(k - 1)) >= 8
            if (cut) { nScenes += 1; run = 1L } else run += 1
            if (run > longest) longest = run
            k += 1
          }
          VideoSceneRow(id, src, lumas.length.toLong, nScenes, longest)
        }
      }
  }

  /** Per-document audio activity segmentation (q257's engine): block
    * count, active-block count, activity segments (maximal runs of
    * active blocks), and the longest segment — the VAD-shaped pass an
    * audio curation pipeline runs to trim silence and split takes. */
  case class AudioSegRow(doc_id: Long, source: String, n_blocks: Long,
                         n_active_blocks: Long, n_segments: Long,
                         longest_segment: Long)

  /** Mono signed 16-bit PCM little-endian WAV bytes — the
    * MultimodalSpec generator promoted to the library as the
    * deterministic audio ingest stand-in (this container has no audio
    * fixtures), exercised through the REAL javax.sound encode path. */
  private def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthesize a WAV per document (amplitude (code%32+1)·1000 per
    * character, 0 for spaces, alternating sign), round-trip it through
    * the REAL javax.sound encode → decode path, then segment the
    * DECODED samples: 8-sample blocks, a block is ACTIVE when its
    * absolute-amplitude sum reaches 104000 (8 × the mid amplitude),
    * segments are maximal active runs. The amplitude rule is plain
    * integer arithmetic on character codes, so the DuckDB oracle can
    * re-derive every block verdict from the text alone — which makes
    * the whole encode/decode/segment pipeline sit under the hash gate
    * (a codec bug that perturbs one sample flips a block sum). Per-
    * partition init, one pass per payload, no shuffle. */
  def audioSegments(docs: org.apache.spark.sql.DataFrame)
      : Dataset[AudioSegRow] = {
    import docs.sparkSession.implicits._
    docs.selectExpr("doc_id", "source", "text")
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, src, text) =>
          // one sample per CODE POINT (the q260 rule): the DuckDB twin's
          // substr/length/ascii count code points, so surrogate pairs
          // must be ONE sample, and the amplitude comes from the full
          // code point — charAt/length would diverge on non-BMP text
          val cps = text.codePoints().toArray
          val samples = new Array[Short](cps.length)
          var i = 0
          while (i < cps.length) {
            val c = cps(i)
            val a = if (c == ' '.toInt) 0 else ((c % 32) + 1) * 1000
            samples(i) = (if (i % 2 == 0) a else -a).toShort
            i += 1
          }
          // empty text ⇒ zero blocks, no codec round-trip to run (a
          // zero-frame WAV is codec-edge behavior we need not depend on)
          val decoded =
            if (samples.isEmpty) Array.empty[Int]
            else (for {
              (fmt, frames) <- tryDecodeAudio(wavBytes(8000, samples))
              s <- pcm16Samples(fmt, frames)
            } yield s).getOrElse(
              sys.error(s"doc $id: synthesized WAV failed to decode"))
          val nBlocks = (decoded.length + 7) / 8
          var (nActive, nSeg, longest, run) = (0L, 0L, 0L, 0L)
          var b = 0
          while (b < nBlocks) {
            var sumAbs = 0L
            var j = b * 8
            val end = math.min(decoded.length, j + 8)
            while (j < end) { sumAbs += math.abs(decoded(j)); j += 1 }
            if (sumAbs >= 104000L) {
              nActive += 1; run += 1
              if (run == 1) nSeg += 1
              if (run > longest) longest = run
            } else run = 0
            b += 1
          }
          AudioSegRow(id, src, nBlocks.toLong, nActive, nSeg, longest)
        }
      }
  }
}
