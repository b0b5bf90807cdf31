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

  test("resize emits one row per media row with the target geometry, deterministically") {
    val a = BinaryPipeline.resize(media, 224, 224).collect()
    val b = BinaryPipeline.resize(media, 224, 224).collect()
    assert(a.length === media.count())
    assert(a.forall(r => r.target_w == 224 && r.target_h == 224))
    assert(a.sortBy(_.doc_id).toSeq === b.sortBy(_.doc_id).toSeq,
      "the resample digest must be a pure function of (input, geometry)")
    // distinct inputs must not collapse to one resized digest
    assert(a.map(_.resized_checksum).distinct.length > 1)
  }

  /** A real PNG, generated in-test (javax.imageio round-trip): left half
    * solid dark, right half solid light — known geometry, known pixels. */
  private def pngBytes(w: Int, h: Int, leftRgb: Int, rightRgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) leftRgb else rightRgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaOf(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.map { case (id, b) => graft.multimodal.MediaRow(id, b, "png") }.toDS()
  }

  test("a real PNG decodes to its actual geometry (not the length fake)") {
    val ds = mediaOf(1L -> pngBytes(33, 17, 0x202020, 0xe0e0e0))
    val d = BinaryPipeline.decode(ds).collect().head
    assert(d.width === 33 && d.height === 17)
  }

  test("feature extraction consumes actual pixels: block means of a known image") {
    // left half lum 0x40=64, right half 0xc0=192 (grayscale: luma == channel)
    val ds = mediaOf(7L -> pngBytes(64, 64, 0x404040, 0xc0c0c0))
    val vec = BinaryPipeline.featureExtract(ds, dim = 64).collect().head.embedding
    // 8x8 grid over a 64x64 image: each cell is uniform — left 4 columns
    // (64-128)/128 = -0.5, right 4 columns (192-128)/128 = +0.5
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val expected = if (cx < 4) -0.5f else 0.5f
      assert(vec(cy * 8 + cx) === expected,
        s"cell ($cx,$cy): got ${vec(cy * 8 + cx)}")
    }
  }

  test("resize resamples actual pixels: digest matches the expected ARGB bytes") {
    val ds = mediaOf(9L -> pngBytes(10, 10, 0xff0000, 0xff0000))
    val r = BinaryPipeline.resize(ds, 4, 4).collect().head
    assert(r.width === 10 && r.height === 10)
    // a uniform red source resamples to uniform red: digest of 16 ARGB
    // pixels ff ff 00 00, computed independently here
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 16).foreach { _ =>
      md.update(Array(0xff.toByte, 0xff.toByte, 0x00.toByte, 0x00.toByte))
    }
    val expected = md.digest().map("%02x".format(_)).mkString
    assert(r.resized_checksum === expected)
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

  /** A real WAV, generated in-test (javax.sound.sampled round-trip):
    * mono signed 16-bit PCM little-endian at the given rate — known
    * format, known samples. */
  private def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("a real WAV decodes to its actual format and exact sample stats") {
    // 100 frames alternating +1000/-1000: peak 1000, mean |amp| 1000
    val samples = Array.tabulate(100)(i => if (i % 2 == 0) 1000 else -1000).map(_.toShort)
    val ds = mediaOf(11L -> wavBytes(16000, samples))
    val a = BinaryPipeline.decodeAudio(ds).collect().head
    assert(a.decoded, "WAV must take the real decode path")
    assert(a.sample_rate === 16000 && a.channels === 1 && a.bits_per_sample === 16)
    assert(a.n_frames === 100L)
    assert(a.peak_abs === 1000)
    assert(a.mean_abs_e6 === 1000L * 1000000L)
    // ...and a non-audio payload reports decoded = false, not fake-real
    val fake = BinaryPipeline.decodeAudio(
      mediaOf(12L -> "not audio at all".getBytes("UTF-8"))).collect().head
    assert(!fake.decoded)
  }

  test("feature extraction consumes actual samples: block energy of a known WAV") {
    // 640 frames: first half silence, second half amplitude 16384 ->
    // 64 blocks of 10 samples each: blocks 0-31 = 0, blocks 32-63 = 0.5
    val samples = Array.tabulate(640)(i => if (i < 320) 0 else 16384).map(_.toShort)
    val ds = mediaOf(13L -> wavBytes(8000, samples))
    val vec = BinaryPipeline.featureExtract(ds, dim = 64).collect().head.embedding
    for (i <- 0 until 64) {
      val expected = if (i < 32) 0f else 0.5f
      assert(vec(i) === expected, s"block $i: got ${vec(i)}")
    }
  }

  /** A real Y4M stream, generated in-test: C420 planar frames with the
    * given per-frame luma planes (chroma planes zero-filled — the demux
    * skips them). */
  private def y4mBytes(w: Int, h: Int, lumaFrames: Array[Byte]*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    val chroma = new Array[Byte](2 * ((w + 1) / 2) * ((h + 1) / 2))
    lumaFrames.foreach { luma =>
      require(luma.length == w * h)
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(luma)
      bos.write(chroma)
    }
    bos.toByteArray
  }

  /** A real AVI/MJPEG container, generated in-test: RIFF('AVI ') holding
    * a LIST('movi') of `00dc` chunks, each a JDK-encoded JPEG. */
  private def aviBytes(jpegs: Array[Byte]*): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(id.getBytes("US-ASCII"))
      val n = body.length
      bos.write(Array[Byte](n.toByte, (n >> 8).toByte, (n >> 16).toByte, (n >> 24).toByte))
      bos.write(body)
      if ((n & 1) == 1) bos.write(0) // RIFF chunks pad to even
      bos.toByteArray
    }
    val movi = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("movi".getBytes("US-ASCII"))
      jpegs.foreach(j => bos.write(chunk("00dc", j)))
      bos.toByteArray
    }
    val riffBody = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("AVI ".getBytes("US-ASCII"))
      bos.write(chunk("LIST", movi))
      bos.toByteArray
    }
    chunk("RIFF", riffBody)
  }

  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("a real Y4M demuxes to its actual frames: geometry, count, exact luma means") {
    val f0 = Array.fill[Byte](32)(64)           // uniform 64
    val f1 = Array.fill[Byte](32)(192.toByte)   // uniform 192
    val f2 = Array.tabulate[Byte](32)(i => if (i % 8 < 4) 0 else 200.toByte)
    val ds = mediaOf(21L -> y4mBytes(8, 4, f0, f1, f2))
    val rows = BinaryPipeline.decodeVideo(ds).collect().sortBy(_.frame_idx)
    assert(rows.length === 3)
    assert(rows.forall(r => r.decoded && r.width == 8 && r.height == 4
      && r.n_bytes == 32))
    assert(rows.map(_.mean_luma).toSeq === Seq(64, 192, 100))
    // the digest covers the actual luma plane bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(f0).map("%02x".format(_)).mkString
    assert(rows.head.frame_md5 === expected)
  }

  test("video rate sampling keeps every n-th demuxed frame") {
    val frames = (0 until 6).map(i => Array.fill[Byte](32)((i * 20).toByte))
    val ds = mediaOf(22L -> y4mBytes(8, 4, frames: _*))
    val rows = BinaryPipeline.decodeVideo(ds, every = 2).collect().sortBy(_.frame_idx)
    assert(rows.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(rows.map(_.mean_luma).toSeq === Seq(0, 40, 80))
  }

  test("a real AVI/MJPEG demuxes via the RIFF walk: per-frame JPEG decode") {
    val j0 = jpegBytes(16, 12, 0x808080)
    val j1 = jpegBytes(16, 12, 0x404040)
    val ds = mediaOf(23L -> aviBytes(j0, j1))
    val rows = BinaryPipeline.decodeVideo(ds).collect().sortBy(_.frame_idx)
    assert(rows.length === 2)
    assert(rows.forall(r => r.decoded && r.width == 16 && r.height == 12))
    // JPEG is lossy but a uniform field decodes (near-)uniform: compare
    // against an independent decode of the same frame bytes
    def meanOf(jpeg: Array[Byte]): Int = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      var sum = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        sum += (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff)
          + 114 * (p & 0xff)) / 1000
      }
      (sum / (img.getWidth * img.getHeight)).toInt
    }
    assert(rows.map(_.mean_luma).toSeq === Seq(meanOf(j0), meanOf(j1)))
    assert(rows(0).mean_luma > rows(1).mean_luma + 30,
      "the two planted frames must be distinguishable")
  }

  test("feature extraction consumes actual video frames: frame-0 block means") {
    // frame 0 uniform luma 64 -> every block (64-128)/128 = -0.5; a
    // second, different frame proves frame 0 is the one described
    val f0 = Array.fill[Byte](64 * 64)(64)
    val f1 = Array.fill[Byte](64 * 64)(192.toByte)
    val ds = mediaOf(24L -> y4mBytes(64, 64, f0, f1))
    val vec = BinaryPipeline.featureExtract(ds, dim = 64).collect().head.embedding
    assert(vec.forall(_ === -0.5f), s"got ${vec.toSeq.take(4)}...")
  }

  test("pixel-stats parity: the same frame as Y4M and as MJPEG decodes to the same luma") {
    // the two container paths must agree on WHAT a pixel is: the Y4M
    // path reads the raw Y plane, the MJPEG path decodes JPEG via
    // ImageIO and converts through the shared BT.601 integer luma — a
    // gray frame (R=G=B=v has luma exactly v) built from 8x8-aligned
    // uniform regions survives JPEG's DCT quantization (near-)exactly,
    // so the two decodes must report the same geometry and luma stats
    val (w, h) = (64, 64)
    val luma = Array.tabulate[Byte](w * h)(i =>
      if (i / w < h / 2) 100.toByte else 200.toByte)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = luma(y * w + x) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val ds = mediaOf(26L -> y4mBytes(w, h, luma), 27L -> aviBytes(bos.toByteArray))

    val rows = BinaryPipeline.decodeVideo(ds).collect()
    val ry = rows.find(_.doc_id == 26L).get
    val rj = rows.find(_.doc_id == 27L).get
    assert(ry.decoded && rj.decoded)
    assert((ry.width, ry.height) === (rj.width, rj.height),
      "both containers must report the true frame geometry")
    assert(math.abs(ry.mean_luma - rj.mean_luma) <= 1,
      s"mean luma must match across containers: y4m=${ry.mean_luma} mjpeg=${rj.mean_luma}")

    // and the downstream FEATURES are pixel-derived the same way: the
    // 8x8 block means of the two decodes agree within JPEG tolerance
    val vecs = BinaryPipeline.featureExtract(ds, dim = 64).collect()
      .map(r => r.doc_id -> r.embedding).toMap
    vecs(26L).zip(vecs(27L)).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) <= 2f / 128f,
        s"block $i: y4m=$a mjpeg=$b diverge beyond JPEG quantization")
    }
  }

  test("non-video payloads keep the byte-slice fallback with decoded=false") {
    val ds = mediaOf(25L -> ("x" * 600).getBytes("UTF-8"))
    val rows = BinaryPipeline.decodeVideo(ds).collect().sortBy(_.frame_idx)
    assert(rows.length === 3) // ceil(600/256)
    assert(rows.forall(r => !r.decoded && r.width == 0 && r.height == 0))
    assert(rows.map(_.n_bytes).toSeq === Seq(256, 256, 88))
  }

  /** pngBytes with one 8x8 grid cell (cx, cy) of a 64x64 image overridden. */
  private def pngWithCell(leftRgb: Int, rightRgb: Int,
                          cx: Int, cy: Int, cellRgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val base = if (x < 32) leftRgb else rightRgb
      val inCell = x / 8 == cx && y / 8 == cy
      img.setRGB(x, y, if (inCell) cellRgb else base)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash consumes actual pixels: known image, exact expected 64 bits") {
    // left half luma 64, right half 192: mean 128, exactly the right
    // 4 block-columns of every row are brighter -> bits cx >= 4
    val ds = mediaOf(30L -> pngBytes(64, 64, 0x404040, 0xc0c0c0))
    val h = BinaryPipeline.perceptualHash(ds).collect().head
    val expected = (0 until 8).flatMap(cy => (4 until 8).map(cy * 8 + _))
      .foldLeft(0L)((a, b) => a | (1L << b))
    assert(h.real, "a PNG must take the real-pixel path")
    assert(h.ahash === expected,
      f"expected ${expected}%016x got ${h.ahash}%016x")
  }

  test("aHash near-dup geometry: one changed block flips one bit; inversion flips all") {
    val base = mediaOf(31L -> pngBytes(64, 64, 0x404040, 0xc0c0c0))
    val oneCell = mediaOf(32L -> pngWithCell(0x404040, 0xc0c0c0, 1, 3, 0xc0c0c0))
    val inverted = mediaOf(33L -> pngBytes(64, 64, 0xc0c0c0, 0x404040))
    val hb = BinaryPipeline.perceptualHash(base).collect().head.ahash
    val hc = BinaryPipeline.perceptualHash(oneCell).collect().head.ahash
    val hi = BinaryPipeline.perceptualHash(inverted).collect().head.ahash
    assert(java.lang.Long.bitCount(hb ^ hc) === 1,
      f"one brightened block must flip exactly its own bit: ${hb ^ hc}%016x")
    assert(java.lang.Long.bitCount(hb ^ hi) === 64,
      "a luma inversion flips every bit")
  }

  test("aHash fallback is content-stable and flagged as not-real") {
    val p = "not an image at all".getBytes("UTF-8")
    val a = BinaryPipeline.perceptualHash(mediaOf(40L -> p)).collect().head
    val b = BinaryPipeline.perceptualHash(mediaOf(41L -> p)).collect().head
    assert(!a.real && !b.real)
    assert(a.ahash === b.ahash, "same payload, same fallback hash — exact " +
      "payload dupes still collide on the hash column")
  }
}
