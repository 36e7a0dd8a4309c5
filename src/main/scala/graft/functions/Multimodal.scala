package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by typed `mapPartitions` stages (the Scala analogue
  * of arrow-batched Pandas UDFs: per-partition iterator, Encoder-managed
  * (de)serialization at the codegen boundary).
  *
  * Codec support is tiered: WAV (RIFF/WAVE PCM) and BMP
  * (BITMAPINFOHEADER) have REAL hand-rolled pure-JVM decoders — full
  * header parse + payload framing; PNG and JPEG decode through the JDK's
  * own `javax.imageio` codecs (java.desktop module — still pure JVM, real
  * zlib/DCT decompression to a pixel raster). Formats that genuinely need
  * a native codec (H.264/...) keep the deterministic `decodeStub`
  * fallback so the Spark-side contract (schema, partitioning, batch
  * iteration, binary payload flow) stays testable; swap the stub for a
  * JNI/library call in production, nothing else changes.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode of
  // an in-memory byte array round-trips a temp file — per-row temp-file
  // I/O on executor disks for data already in RAM, and an amplifier under
  // I/O contention. All payloads here are byte arrays, so cache in heap.
  // Runs once per JVM at first module touch (driver or executor).
  javax.imageio.ImageIO.setUseCache(false)

  /** One media payload: id + opaque bytes + declared format. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte], format: String)

  /** Extracted metadata (what a real decoder would emit). */
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, magic: Int, n_frames: Long, format: String)

  /** One sampled frame. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Pack a text column as a binary media payload (stand-in for real image/
    * audio bytes; deterministic). */
  def encodeAsBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("media"),
      lit("txt").as("format"))

  /** STUB decode: byte-level "header parse" for formats without a pure-JVM
    * decoder. A real implementation would call the codec here
    * (per-partition, so native handles are reused across the batch). */
  private def decodeStub(bytes: Array[Byte]): (Int, Long) = {
    val magic = if (bytes.nonEmpty) bytes(0) & 0xff else -1
    val nFrames = bytes.length / 100L // fake: 100 bytes per "frame"
    (magic, nFrames)
  }

  // ---- Real pure-JVM codecs -------------------------------------------

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Decoded WAV header + payload location. */
  final case class WavInfo(
      sample_rate: Int, channels: Int, bits_per_sample: Int,
      n_samples: Long, dataOffset: Int, dataLen: Int)

  /** REAL WAV decode: RIFF/WAVE container walk — `fmt ` chunk for the
    * sample geometry, `data` chunk for the payload. Pure JVM, spec-faithful
    * (chunks are (id, size, payload) with word alignment); throws on
    * malformed input rather than guessing. */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      "not a RIFF/WAVE payload")
    var off = 12
    var rate = -1; var ch = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val sz = le32(bytes, off + 4)
      // fail fast on corrupt sizes: a negative le32 (e.g. 0xFFFFFFF7)
      // would otherwise make `off += 8 + sz + (sz & 1)` stand still or
      // walk backwards — an executor hang instead of an error
      require(sz >= 0, s"WAVE: corrupt chunk size $sz at offset $off")
      id match {
        case "fmt " =>
          ch = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
        case "data" =>
          dataOff = off + 8
          dataLen = sz
        case _ => () // skip unknown chunks (LIST, fact, ...)
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(rate > 0 && ch > 0 && bits > 0, "WAVE: missing fmt chunk")
    require(dataOff >= 0, "WAVE: missing data chunk")
    val blockAlign = ch * (bits / 8)
    WavInfo(rate, ch, bits, dataLen.toLong / blockAlign, dataOff, dataLen)
  }

  /** REAL WAV encode (PCM16 mono by default): each input byte becomes one
    * 16-bit sample. Deterministic, byte-faithful — the test-side generator
    * for real decoder coverage without media libraries. */
  def encodeWavPcm16(payload: Array[Byte], sampleRate: Int = 16000): Array[Byte] = {
    val nSamples = payload.length
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    payload.foreach(b => buf.putShort((b.toInt << 8).toShort))
    buf.array()
  }

  /** Decoded BMP header. */
  final case class BmpInfo(width: Int, height: Int, bits_per_pixel: Int)

  /** REAL BMP decode: `BM` magic + BITMAPINFOHEADER fields (width/height/
    * bpp at fixed little-endian offsets per the Windows DIB spec). */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 30 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    BmpInfo(le32(bytes, 18), le32(bytes, 22), le16(bytes, 28))
  }

  /** REAL BMP encode (24-bit, minimal headers, rows padded to 4 bytes). */
  def encodeBmp24(width: Int, height: Int, pixel: Int => Byte): Array[Byte] = {
    val rowLen = (width * 3 + 3) & ~3
    val dataLen = rowLen * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel-array offset
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until dataLen).foreach(i => buf.put(pixel(i)))
    buf.array()
  }

  /** Decoded raster-image metadata + first-order content statistic. */
  final case class ImageMeta(
      doc_id: Long, width: Int, height: Int, n_pixels: Long, mean_red: Double)

  /** REAL raster encode via `javax.imageio` (pure JVM — the JDK's
    * java.desktop module ships PNG and JPEG codecs, no native libraries):
    * a width×height TYPE_INT_RGB image filled with one color, compressed
    * through the real codec (zlib for PNG, DCT for JPEG). `format` is an
    * ImageIO informal name: "png", "jpg", "bmp", ... */
  def encodeImage(format: String, width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Deterministic uniform-gray test image, closed-form in `id` — ONE
    * definition for the media gates (`src_binaryfile_media`,
    * `mm_png_decode`, `mm_jpeg_decode`) and the geometry their SQL
    * oracles mirror (w = 8 + id % 13, h = 8 + id % 7, gray c = id % 256).
    * Lives here (not in SparkEntry) so executor-side lambdas reach it via
    * static module access without capturing the caller. */
  def grayTestImage(id: Long, fmt: String): Array[Byte] = {
    val w = (8 + id % 13).toInt
    val h = (8 + id % 7).toInt
    val c = (id % 256).toInt
    encodeImage(fmt, w, h, (c << 16) | (c << 8) | c)
  }

  /** REAL raster decode via `javax.imageio`: full container walk + payload
    * decompression to a pixel raster. Emits geometry AND the mean red
    * channel — a content statistic, so a gate proves the pixels actually
    * round-tripped through the codec, not just that a header parsed.
    * Throws on undecodable bytes (fail fast, like [[decodeWav]]). */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
      y += 1
    }
    (w, h, sum.toDouble / (w.toLong * h))
  }

  /** Image decode stage: one iterator pass per partition (per-partition
    * reuse is where a native codec would amortize its handles; ImageIO
    * needs none). */
  def decodeImageMeta(ds: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val (w, h, meanRed) = decodeImage(r.media)
      ImageMeta(r.doc_id, w, h, w.toLong * h, meanRed)
    })
  }

  /** REAL raster RESIZE stage (decode → scale → re-encode → re-decode):
    * each image is halved (floor, min 1 px) through a headless
    * `Graphics2D.drawImage` scale, re-encoded in its own format, and the
    * RESIZED bytes are decoded again for the emitted statistics — so a
    * gate proves the full transform round trip (decode, raster math,
    * encode, decode), not just arithmetic on the source header. On the
    * uniform-gray test images any interpolation kernel is exact (every
    * convex combination of equal pixels is that pixel), which is what
    * makes the content statistic closed-form for the oracle. Map-only,
    * one iterator pass per partition; ImageIO's disk cache is disabled
    * in this object's static init. */
  def resizeHalfMeta(ds: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
      require(img != null, "undecodable image payload")
      val nw = math.max(1, img.getWidth / 2)
      val nh = math.max(1, img.getHeight / 2)
      val dst = new java.awt.image.BufferedImage(
        nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, r.format, bos)
      val (w2, h2, meanRed) = decodeImage(bos.toByteArray)
      ImageMeta(r.doc_id, w2, h2, w2.toLong * h2, meanRed)
    })
  }

  /** Feature-extraction stage: one iterator pass per partition. Real
    * decoders for wav/bmp; stub for formats needing native codecs. */
  def extractMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val (magic, nFrames) = r.format match {
        case "wav" => val w = decodeWav(r.media); ('R'.toInt, w.n_samples)
        case "bmp" => val b = decodeBmp(r.media); ('B'.toInt, b.height.toLong)
        case _ => decodeStub(r.media)
      }
      MediaMeta(r.doc_id, r.media.length.toLong, magic, nFrames, r.format)
    })
  }

  /** Typed WAV metadata row (for the oracle-gated decode query). */
  final case class WavMeta(
      doc_id: Long, sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_samples: Long)

  /** WAV decode stage: real header parse per record, one iterator pass per
    * partition. */
  def decodeWavMeta(ds: Dataset[MediaRecord]): Dataset[WavMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val w = decodeWav(r.media)
      WavMeta(r.doc_id, w.sample_rate, w.channels, w.bits_per_sample, w.n_samples)
    })
  }

  /** WAV frame extraction: real sample-accurate framing — `frameSamples`
    * 16-bit samples per frame from the decoded data chunk. */
  def wavFrames(ds: Dataset[MediaRecord], frameSamples: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      val w = decodeWav(r.media)
      val bytesPerFrame = frameSamples * w.channels * (w.bits_per_sample / 8)
      r.media.slice(w.dataOffset, w.dataOffset + w.dataLen)
        .grouped(bytesPerFrame).zipWithIndex
        .map { case (chunk, i) => Frame(r.doc_id, i, chunk) }
    })
  }

  /** Resize stage: normalize every frame to exactly `size` bytes
    * (truncate or zero-pad) — the shape of image resizing, where a real
    * implementation would call the codec's scaler on each batch element. */
  def resizeFrames(ds: Dataset[Frame], size: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { f =>
      val out = java.util.Arrays.copyOf(f.frame, size) // truncates or zero-pads
      Frame(f.doc_id, f.frame_idx, out)
    })
  }

  /** Frame-sampling stage: split the payload into fixed-size "frames" and
    * keep every `stride`-th one (the shape of video frame sampling). */
  def sampleFrames(ds: Dataset[MediaRecord], frameSize: Int, stride: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      r.media.grouped(frameSize).zipWithIndex.collect {
        case (bytes, i) if i % stride == 0 => Frame(r.doc_id, i, bytes)
      }
    })
  }
}
