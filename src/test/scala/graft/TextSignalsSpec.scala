package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Differential proof that the fused single-traversal [[TextSignals]]
  * expression is bit-identical to the regex-composed definitions it
  * replaces on the cleaning hot path. */
class TextSignalsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table}

  // corpus + hand-picked adversarial strings: empty, double/leading/
  // trailing spaces (split keeps empty tokens), stopwords embedded in
  // longer words (no \b match), digits/underscores extending runs,
  // non-ASCII breaking runs exactly like ASCII \w does, uppercase,
  // words shared across languages, runs longer than any stopword
  private lazy val corpus = {
    import spark.implicits._
    val tricky = Seq(
      "", " ", "  ", "the", " the ", "the  the", "theater the_cat the1 the",
      "a-a a_a a", "la de que un", "café the naïve la", "THE The the",
      "und ist nicht der das", "le la les et est très",
      "el la los las es sí", "of-and.to,in;is it? that! for",
      "x" * 300 + " the", "1 2 3 _ __ a1 1a", "ab\tcd the\nand")
      .toDF("text")
    table("documents").select(col("text")).unionByName(tricky)
  }

  test("fused counts equal the regex-composed counts over corpus + edge cases") {
    val sig = TextAnalysis.signals(col("text")).as("sig")
    val diff = corpus.select(col("text"), sig)
      .where(
        col("sig.n_chars") =!= length(col("text")) ||
        col("sig.n_words") =!= TextAnalysis.wsTokenCount(col("text")) ||
        col("sig.n_alpha") =!=
          size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0))) ||
        TextAnalysis.langStopwords.map { case (l, _) =>
          col(s"sig.hits_$l") =!= TextAnalysis.langHits(col("text"), l)
        }.reduce(_ || _))
    assert(diff.count() === 0)
  }

  test("fused quality score and language id are bit-identical to composed") {
    val sig = TextAnalysis.signals(col("text")).as("sig")
    val diff = corpus.select(col("text"), sig)
      .where(
        // null-safe equality: both are NULL for zero-length inputs
        // (try_divide in alpha_ratio)
        !(TextAnalysis.qualityScoreFromSignals(col("sig")) <=>
          TextAnalysis.qualityScore(col("text"))) ||
        !(TextAnalysis.langIdFromSignals(col("sig")) <=>
          TextAnalysis.langId(col("text"))))
    assert(diff.count() === 0)
  }

  test("randomized differential: 400 seeded-random mixed-content strings") {
    import spark.implicits._
    // seeded generator over a charset chosen to stress every branch of the
    // byte scan: word-run boundaries, multi-byte UTF-8 (2/3/4-byte),
    // digits/underscore extending runs, stopwords of every language,
    // whitespace runs, and run-length > maxWordLen
    val rnd = new scala.util.Random(20260812L)
    val atoms: IndexedSeq[String] =
      TextSignalsUtil_atoms ++ Vector(
        " ", "  ", "\t", "\n", ".", ",", "-", "_", "9", "x", "Z",
        "é", "ß", "中", "🚀", "ö", "abcdefgh", "THE", "De", "unend")
    val strings = Seq.fill(400)(
      Seq.fill(rnd.nextInt(40))(atoms(rnd.nextInt(atoms.length))).mkString).toDF("text")
    val sig = TextAnalysis.signals(col("text")).as("sig")
    val diff = strings.select(col("text"), sig)
      .where(
        col("sig.n_chars") =!= length(col("text")) ||
        col("sig.n_words") =!= TextAnalysis.wsTokenCount(col("text")) ||
        col("sig.n_alpha") =!=
          size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0))) ||
        TextAnalysis.langStopwords.map { case (l, _) =>
          col(s"sig.hits_$l") =!= TextAnalysis.langHits(col("text"), l)
        }.reduce(_ || _))
    val bad = diff.take(3)
    assert(bad.isEmpty, s"fused != composed for: ${bad.map(_.getString(0)).mkString(" | ")}")
  }

  // every stopword of every language, as atoms for the generator
  private def TextSignalsUtil_atoms: IndexedSeq[String] =
    graft.expressions.TextSignalsUtil.langWords.flatMap(_._2).toIndexedSeq

  test("malformed UTF-8 bytes: n_chars matches length(); stray bytes act as boundaries") {
    import spark.implicits._
    // UTF8String does not validate UTF-8 — craft invalid byte sequences
    // through binary→string casts: a stray continuation byte, an invalid
    // lead, and a truncated multi-byte tail. Each must count like
    // length() counts it and behave as a non-word boundary (String
    // conversion yields U+FFFD, category So) — "a" after the stray byte
    // is still a stopword hit in both paths.
    val cases = Seq(
      Array[Byte](0x80.toByte, 'a'.toByte),
      Array[Byte]('f'.toByte, 'o'.toByte, 'r'.toByte, 0xff.toByte, 'a'.toByte),
      Array[Byte]('t'.toByte, 'h'.toByte, 'e'.toByte, 0xc3.toByte), // truncated é
      // structurally valid but semantically invalid sequences — each must
      // act as a boundary, not decode to a word char (r4 advice #1):
      // overlong 2-byte 'a' (0xC1 0xA1) — accepting it would fuse "a?a"
      // into one non-stopword run and lose two hits_en
      Array[Byte]('a'.toByte, 0xc1.toByte, 0xa1.toByte, 'a'.toByte),
      // overlong 3-byte '/' (0xE0 0x80 0xAF)
      Array[Byte]('t'.toByte, 'o'.toByte, 0xe0.toByte, 0x80.toByte,
        0xaf.toByte, 't'.toByte, 'o'.toByte),
      // CESU-8 high surrogate U+D800 (0xED 0xA0 0x80)
      Array[Byte]('i'.toByte, 's'.toByte, 0xed.toByte, 0xa0.toByte,
        0x80.toByte, 'i'.toByte, 's'.toByte),
      // past U+10FFFF: 0xF4 0x90 0x80 0x80 = cp 0x110000
      Array[Byte]('o'.toByte, 'f'.toByte, 0xf4.toByte, 0x90.toByte,
        0x80.toByte, 0x80.toByte, 'o'.toByte, 'f'.toByte))
    val df = cases.toDF("raw").select(col("raw").cast("string").as("text"))
    val sig = TextAnalysis.signals(col("text")).as("sig")
    val diff = df.select(col("text"), sig)
      .where(
        col("sig.n_chars") =!= length(col("text")) ||
        col("sig.n_alpha") =!=
          size(regexp_extract_all(col("text"), lit("[A-Za-z]"), lit(0))) ||
        col("sig.hits_en") =!= TextAnalysis.langHits(col("text"), "en"))
    assert(diff.count() === 0)
  }

  test("stripHtml: blocks, tags, entities, whitespace — and plain text passthrough") {
    import SparkTestSession.spark
    import spark.implicits._
    val cases = Seq(
      // script/style bodies vanish wholesale, including their markup-ish
      // content; dotall: blocks may span lines
      ("<script>if (a<b) { alert('<p>') }</script>hello", "hello"),
      ("<style>\np { color: red }\n</style>world", "world"),
      ("<SCRIPT src=\"x.js\">var y=1;</SCRIPT>mixed case", "mixed case"),
      // tags become spaces (word boundary preserved), attrs dropped
      ("a<p class=\"x\">b</p>c", "a b c"),
      // entities unescape, &amp; LAST: &amp;lt; is the literal text "&lt;"
      ("&lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39; &amp;lt;", "<tag> & \"q\" 's' &lt;"),
      // whitespace collapses and trims
      ("  a\n\n b\tc  ", "a b c"),
      // no markup: unchanged
      ("plain text stays", "plain text stays"))
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.stripHtml(col("h"))).collect().map(_.getString(0))
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g === w) }
  }

  test("signals survive whole-stage codegen and interpreted eval identically") {
    // collect() exercises codegen; a literal eval outside codegen hits
    // nullSafeEval — both funnel into the same traversal
    val row = spark.range(1).select(
      TextAnalysis.signals(lit("the cat sat on the mat")).as("sig"))
      .select("sig.*").head()
    assert(row.getInt(0) === 22) // chars
    assert(row.getInt(1) === 6)  // ws tokens
    assert(row.getInt(2) === 17) // letters
    assert(row.getInt(3) === 2)  // "the" twice; cat/sat/on/mat aren't stopwords
  }
}
