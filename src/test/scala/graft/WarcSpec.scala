package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Corpus
import graft.sources.Warc

/** WARC/1.0 framing parser + GPT-2 tokenizer-artifact format round-trips
  * — the corners the oracle-gated fixtures (src_warc_ingest,
  * corpus_bpe_pretrained) don't reach: torn tails, LF-only line ends,
  * unknown headers, binary payloads, byte-level merge symbols, JSON
  * escaping. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rec(id: Long, payload: Array[Byte],
      warcType: String = "response"): Warc.WarcRecord =
    Warc.WarcRecord(warcType, s"<urn:uuid:t-$id>",
      s"http://t.example/$id", payload.length.toLong, payload)

  test("writeMember/parseMember round-trips records incl. binary payloads") {
    val p0 = "hello world".getBytes("UTF-8")
    val p1 = Array.tabulate[Byte](257)(i => (i % 251).toByte) // raw bytes incl. \r\n
    val p2 = Array.empty[Byte]
    val tmp = java.nio.file.Files.createTempFile("warcspec", ".warc")
    try {
      Warc.writeMember(Seq(rec(0, p0), rec(1, p1, "resource"), rec(2, p2)), tmp)
      val got = Warc.parseMember(java.nio.file.Files.readAllBytes(tmp)).toSeq
      assert(got.map(_.recordId) === Seq("<urn:uuid:t-0>", "<urn:uuid:t-1>", "<urn:uuid:t-2>"))
      assert(got.map(_.warcType) === Seq("response", "resource", "response"))
      assert(got(0).payload.toSeq === p0.toSeq)
      assert(got(1).payload.toSeq === p1.toSeq)
      assert(got(2).payload.isEmpty)
      assert(got.map(_.contentLength) === Seq(p0.length.toLong, 257L, 0L))
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("parseMember tolerates LF-only line ends and unknown headers") {
    val payload = "abc"
    val member = ("WARC/1.0\nWARC-Type: response\nX-Unknown: zzz\n" +
      s"WARC-Target-URI: http://x/1\nContent-Length: ${payload.length}\n\n" +
      payload + "\n\n").getBytes("UTF-8")
    val got = Warc.parseMember(member).toSeq
    assert(got.size === 1)
    assert(got.head.targetUri === "http://x/1")
    assert(new String(got.head.payload, "UTF-8") === payload)
  }

  test("parseMember stops at a torn tail without failing") {
    val good = {
      val tmp = java.nio.file.Files.createTempFile("warcspec", ".warc")
      try { Warc.writeMember(Seq(rec(7, "ok".getBytes)), tmp)
        java.nio.file.Files.readAllBytes(tmp) }
      finally java.nio.file.Files.deleteIfExists(tmp)
    }
    // declared length runs past the member end -> record dropped, no throw
    val torn = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 9999\r\n\r\nshort").getBytes("UTF-8")
    assert(Warc.parseMember(good ++ torn).toSeq.size === 1)
    // garbage instead of a version line ends the scan
    assert(Warc.parseMember(good ++ "not a warc".getBytes).toSeq.size === 1)
  }

  test("writeMemberGz/parseMember round-trips record-level gzip members") {
    val p0 = "hello gzip".getBytes("UTF-8")
    val p1 = Array.tabulate[Byte](257)(i => (i % 251).toByte)
    val tmp = java.nio.file.Files.createTempFile("warcspec", ".warc.gz")
    try {
      Warc.writeMemberGz(Seq(rec(0, p0), rec(1, p1, "resource")), tmp)
      val bytes = java.nio.file.Files.readAllBytes(tmp)
      assert((bytes(0) & 0xff) === 0x1f && (bytes(1) & 0xff) === 0x8b)
      val got = Warc.parseMember(bytes).toSeq
      assert(got.map(_.recordId) === Seq("<urn:uuid:t-0>", "<urn:uuid:t-1>"))
      assert(got(0).payload.toSeq === p0.toSeq)
      assert(got(1).payload.toSeq === p1.toSeq)
      // and the gzip layout is RECORD-level: each record its own member,
      // so parsing from the second member's offset alone also works
      val secondStart = {
        // find the second 0x1f8b magic (payloads are inside deflate, so
        // scanning the container is unambiguous here)
        (1 until bytes.length - 1).find(i =>
          (bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b).get
      }
      val tail = Warc.parseMember(
        java.util.Arrays.copyOfRange(bytes, secondStart, bytes.length)).toSeq
      assert(tail.map(_.recordId) === Seq("<urn:uuid:t-1>"))
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("truncated gzip tail yields the intact prefix records, no throw") {
    val tmp = java.nio.file.Files.createTempFile("warcspec", ".warc.gz")
    try {
      Warc.writeMemberGz(Seq(rec(0, "first".getBytes),
        rec(1, ("x" * 5000).getBytes)), tmp)
      val bytes = java.nio.file.Files.readAllBytes(tmp)
      val torn = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 40)
      val got = Warc.parseMember(torn).toSeq
      assert(got.map(_.recordId) === Seq("<urn:uuid:t-0>"))
      // corrupt gzip header (magic then garbage) -> empty, no throw
      assert(Warc.parseMember(
        Array[Byte](0x1f, 0x8b.toByte, 0x7f, 0x00)).toSeq.isEmpty)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("httpBody decodes a declared Latin-1 body correctly") {
    import spark.implicits._
    val latin1Text = "café naïve über" // é ï ü
    val l1 = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=ISO-8859-1\r\n\r\n" + latin1Text).getBytes("ISO-8859-1")
    val quoted = ("HTTP/1.1 200 OK\r\ncontent-type: text/plain;" +
      "charset=\"latin1\"\r\n\r\n" + latin1Text).getBytes("ISO-8859-1")
    val utf8 = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=utf-8\r\n\r\n" + latin1Text).getBytes("UTF-8")
    val plain = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      latin1Text).getBytes("UTF-8")
    val df = Seq(l1, quoted, utf8, plain).toDF("payload")
      .select(Warc.httpBody(col("payload")).as("b"))
    assert(df.as[String].collect().toSeq ===
      Seq(latin1Text, latin1Text, latin1Text, latin1Text))
  }

  test("httpBody peels the HTTP header block, passes raw payloads through") {
    import spark.implicits._
    val df = Seq(
      ("HTTP/1.1 200 OK\r\nA: b\r\n\r\nBODY").getBytes("UTF-8"),
      "no header block".getBytes("UTF-8"))
      .toDF("payload")
      .select(Warc.httpBody(col("payload")).as("b"))
    assert(df.as[String].collect().toSeq === Seq("BODY", "no header block"))
  }

  test("GPT-2 merges.txt round-trip preserves rank order and skips comments") {
    import spark.implicits._
    val merges = Seq((1, "t", "h", "th", 10L), (2, "th", "e", "the", 8L),
      (3, "a", "n", "an", 5L))
      .toDF("rank", "left", "right", "merged", "pair_cnt")
    val tmp = java.nio.file.Files.createTempDirectory("bpespec")
    try {
      val f = s"$tmp/merges.txt"
      Corpus.bpeSaveMerges(merges, f)
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)), "UTF-8")
      assert(txt.startsWith("#version: 0.2\n"))
      val back = Corpus.bpeLoadMerges(spark, f)
        .orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
      assert(back.toSeq === Seq((1, "t", "h", "th"), (2, "th", "e", "the"),
        (3, "a", "n", "an")))
    } finally graft.gates.GateSupport.deleteRecursively(tmp)
  }

  test("vocab.json round-trip escapes control chars and quotes") {
    import spark.implicits._
    // GPT-2 byte-alphabet symbols above U+0100 plus a quote and the BPE
    // sentinel control char — the characters a real vocab.json carries
    val vocab = Seq(("Ġthe", 262L), ("\"", 1L), ("a", 99L),
      ("\\", 2L)).toDF("token", "id")
    val tmp = java.nio.file.Files.createTempDirectory("bpespec")
    try {
      val f = s"$tmp/vocab.json"
      Corpus.bpeSaveVocab(vocab, f)
      val back = Corpus.bpeLoadVocab(spark, f)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(back === Map("Ġthe" -> 262L, "\"" -> 1L, "a" -> 99L,
        "\\" -> 2L))
    } finally graft.gates.GateSupport.deleteRecursively(tmp)
  }

  test("loaded merges encode identically to the in-memory merge table") {
    val docs = SparkTestSession.table("documents").limit(40)
    val merges = Corpus.bpeTrain(docs, "text", numMerges = 12)
    val tmp = java.nio.file.Files.createTempDirectory("bpespec")
    try {
      val f = s"$tmp/merges.txt"
      Corpus.bpeSaveMerges(merges, f)
      val loaded = Corpus.bpeLoadMerges(spark, f)
      val a = Corpus.bpeEncode(docs, "doc_id", "text", merges)
        .select(col("doc_id"), array_join(col("subtokens"), " ").as("s"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
      val b = Corpus.bpeEncode(docs, "doc_id", "text", loaded)
        .select(col("doc_id"), array_join(col("subtokens"), " ").as("s"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(a.toSeq === b.toSeq)
    } finally graft.gates.GateSupport.deleteRecursively(tmp)
  }
}
