package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Multimodal, TextAnalysis}

class TextMultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table}

  lazy val docs = table("documents").cache()

  test("langid picks the language whose stopwords dominate") {
    import spark.implicits._
    val df = Seq(
      "the cat is on the mat and it is warm",
      "der hund ist nicht zu haus und die katze",
      "le chat est dans la maison et il est content",
      "xyzzy qwerty").toDF("text")
      .select(TextAnalysis.langId(col("text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("en", "de", "fr", "und"))
  }

  test("quality score stays in [0,1] on the corpus") {
    val q = docs.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).head()
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }

  test("token counts: ws <= bpeish, approx = ceil(chars/4)") {
    val bad = docs.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bp"),
      TextAnalysis.approxTokenCount(col("text")).as("ap"),
      ceil(length(col("text")) / 4.0).cast("long").as("expected_ap"))
    assert(bad.where(col("ws") > col("bp")).count() === 0)
    assert(bad.where(col("ap") =!= col("expected_ap")).count() === 0)
  }

  test("winnowing fingerprints: near-dup docs share most fingerprints") {
    val pair = Dedup.ngramJaccardPairs(docs, "doc_id", "text").select("doc_a", "doc_b").head()
    val fps = docs.where(col("doc_id").isin(pair.getLong(0), pair.getLong(1)))
      .select(TextAnalysis.fingerprints(col("text")).as("fp"))
      .collect().map(_.getSeq[Long](0).toSet)
    val overlap = fps(0).intersect(fps(1)).size.toDouble /
      math.max(fps(0).size, fps(1).size)
    assert(overlap > 0.5, s"fingerprint overlap $overlap")
  }

  test("multimodal: binary payload metadata matches source bytes") {
    import spark.implicits._
    val media = Multimodal.encodeAsBinary(docs, "doc_id", "text")
      .as[Multimodal.MediaRecord]
    val meta = Multimodal.extractMeta(media).toDF()
    val joined = meta.join(docs, "doc_id")
    // ASCII corpus: byte length == char count; magic == first char code
    assert(joined.where(col("byte_len") =!= col("n_chars")).count() === 0)
    assert(joined.where(col("magic") =!= ascii(substring(col("text"), 1, 1))).count() === 0)
  }

  test("multimodal: resize normalizes every frame to the target size") {
    import spark.implicits._
    val media = Multimodal.encodeAsBinary(docs.limit(10), "doc_id", "text")
      .as[Multimodal.MediaRecord]
    val frames = Multimodal.sampleFrames(media, frameSize = 64, stride = 1)
    val resized = Multimodal.resizeFrames(frames, size = 32)
    val sizes = resized.map(_.frame.length).distinct().collect()
    assert(sizes.toSeq === Seq(32))
    assert(resized.count() === frames.count())
  }

  test("WAV codec: encode → decode round-trips header and sample count") {
    val payload = "hello wave world".getBytes("US-ASCII")
    val wav = Multimodal.encodeWavPcm16(payload, sampleRate = 22050)
    val info = Multimodal.decodeWav(wav)
    assert(info.sample_rate === 22050)
    assert(info.channels === 1)
    assert(info.bits_per_sample === 16)
    assert(info.n_samples === payload.length.toLong)
    // data chunk payload round-trips the source bytes (high byte of PCM16)
    val data = wav.slice(info.dataOffset, info.dataOffset + info.dataLen)
    val highBytes = data.grouped(2).map(_(1)).toArray
    assert(highBytes.toSeq === payload.toSeq)
    // malformed input fails fast, never a silent guess
    assertThrows[IllegalArgumentException](Multimodal.decodeWav("nope".getBytes))
  }

  test("WAV decode skips unknown chunks before data (spec-faithful walk)") {
    val payload = Array[Byte](1, 2, 3, 4)
    val wav = Multimodal.encodeWavPcm16(payload)
    // splice a LIST chunk between fmt and data
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = wav.slice(0, 36) ++ extra ++ wav.slice(36, wav.length)
    val info = Multimodal.decodeWav(spliced)
    assert(info.n_samples === 4L)
    assert(info.sample_rate === 16000)
  }

  test("BMP codec: encode → decode recovers geometry") {
    val bmp = Multimodal.encodeBmp24(width = 7, height = 3, pixel = i => (i % 251).toByte)
    val info = Multimodal.decodeBmp(bmp)
    assert(info === Multimodal.BmpInfo(7, 3, 24))
    assertThrows[IllegalArgumentException](Multimodal.decodeBmp(Array[Byte](1, 2, 3)))
  }

  test("PNG/JPEG codecs: real ImageIO round-trip recovers geometry and content") {
    // PNG is lossless: the uniform fill must survive exactly
    val png = Multimodal.encodeImage("png", 17, 9, (200 << 16) | (200 << 8) | 200)
    // real PNG container: 8-byte signature
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (pw, ph, pRed) = Multimodal.decodeImage(png)
    assert(pw === 17 && ph === 9 && pRed === 200.0)
    // JPEG is lossy DCT: geometry exact, content within DC-quant tolerance
    val jpg = Multimodal.encodeImage("jpg", 12, 10, (77 << 16) | (77 << 8) | 77)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8) // SOI marker
    val (jw, jh, jRed) = Multimodal.decodeImage(jpg)
    assert(jw === 12 && jh === 10)
    assert(math.abs(jRed - 77.0) <= 3.0, s"jpeg mean red $jRed vs 77")
    assertThrows[IllegalArgumentException](Multimodal.decodeImage(Array[Byte](1, 2, 3)))
  }

  test("resizeHalfMeta: floor-halved geometry, uniform fill exact, via the real codec") {
    import spark.implicits._
    val imgs = docs.limit(20).select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        Multimodal.MediaRecord(id, Multimodal.grayTestImage(id, "png"), "png")))
    val got = Multimodal.resizeHalfMeta(imgs).collect()
    assert(got.length === 20)
    got.foreach { m =>
      val (w, h, c) = ((8 + m.doc_id % 13).toInt, (8 + m.doc_id % 7).toInt, (m.doc_id % 256).toDouble)
      assert(m.width === w / 2 && m.height === h / 2)
      assert(m.n_pixels === (w / 2).toLong * (h / 2))
      // uniform gray survives any interpolation kernel exactly (PNG lossless)
      assert(m.mean_red === c, s"doc ${m.doc_id}")
    }
  }

  test("WAV frame extraction: sample-accurate frames from the data chunk") {
    import spark.implicits._
    val media = Multimodal.encodeAsBinary(docs.limit(10), "doc_id", "text")
      .as[Multimodal.MediaRecord]
    val wavs = media.map(r =>
      Multimodal.MediaRecord(r.doc_id, Multimodal.encodeWavPcm16(r.media), "wav"))
    val frames = Multimodal.wavFrames(wavs, frameSamples = 25).toDF()
    val counts = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .join(docs, "doc_id")
      // one byte of text = one PCM16 sample = 2 data bytes; 25 samples/frame
      .withColumn("expected", ceil(col("n_chars") / 25.0).cast("long"))
    assert(counts.where(col("n") =!= col("expected")).count() === 0)
    // every full frame carries exactly frameSamples * 2 bytes
    val fullFrames = Multimodal.wavFrames(wavs, frameSamples = 25)
      .filter(_.frame_idx == 0).map(_.frame.length).distinct().collect()
    assert(fullFrames.toSeq === Seq(50))
  }

  test("extractMeta uses the real decoder for wav format") {
    import spark.implicits._
    val media = Multimodal.encodeAsBinary(docs.limit(5), "doc_id", "text")
      .as[Multimodal.MediaRecord]
    val wavs = media.map(r =>
      Multimodal.MediaRecord(r.doc_id, Multimodal.encodeWavPcm16(r.media), "wav"))
    val meta = Multimodal.extractMeta(wavs).toDF().join(docs, "doc_id")
    // n_frames for wav == decoded sample count == text byte count
    assert(meta.where(col("n_frames") =!= col("n_chars")).count() === 0)
  }

  test("multimodal: frame sampling arithmetic") {
    import spark.implicits._
    val media = Multimodal.encodeAsBinary(docs.limit(20), "doc_id", "text")
      .as[Multimodal.MediaRecord]
    val frames = Multimodal.sampleFrames(media, frameSize = 50, stride = 2).toDF()
    val counts = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .join(docs, "doc_id")
      .withColumn("expected", ceil(ceil(col("n_chars") / 50.0) / 2.0).cast("long"))
    assert(counts.where(col("n") =!= col("expected")).count() === 0)
  }
}
