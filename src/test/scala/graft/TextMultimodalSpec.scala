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
