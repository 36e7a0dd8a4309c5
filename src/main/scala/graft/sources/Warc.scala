package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) raw-crawl ingestion — the canonical LLM
  * pretraining source format (Common Crawl ships WARC/1.0 members).
  *
  * Scale shape: archive members arrive through the `binaryFile` source,
  * ONE member per task — the processing granularity every CC pipeline
  * uses (members are ~1 GB and are not line-splittable because record
  * payloads are arbitrary bytes), so a 100 TB crawl parallelizes across
  * its ~100k members with zero shuffle; parsing is a single forward scan
  * per member. Payloads stay `binary` (they may be HTTP responses,
  * gzip, or media) with [[httpBody]] as the codegen'd accessor for the
  * dominant response-record case; downstream composes the existing
  * text path (stripHtml → c4Clean → quality/dedup) unchanged.
  */
object Warc {

  final case class WarcRecord(
      warcType: String,
      recordId: String,
      targetUri: String,
      contentLength: Long,
      payload: Array[Byte])

  /** Parse WARC/1.0 framing from a byte STREAM: per record a `WARC/1.0`
    * version line, `Name: Value` header lines up to a blank line (CRLF
    * per spec; lone LF tolerated — real crawls contain both), exactly
    * `Content-Length` payload octets, then the blank-line record
    * separator. Records with no parsable version line, a truncated
    * payload, or a mid-record decode error end the member (crawl members
    * are best-effort concatenations — a torn tail must not fail the
    * task). Streaming, O(record) memory PAST DECOMPRESSION: the member
    * never has to be inflated whole, which is what keeps a 1 GB gzipped
    * CC member parseable in a normally-sized executor task. The
    * COMPRESSED member, however, still arrives as one `binaryFile`
    * `Array[Byte]` per task ([[readRecords]]), so peak memory is
    * compressed-size + one record, and a member is hard-capped at 2 GB
    * by the JVM array limit — fine for Common Crawl's ~1 GB members;
    * a larger archive needs a range-splitting reader, not this one. */
  private[graft] def parseStream(raw: java.io.InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private val in = new java.io.BufferedInputStream(raw, 1 << 16)
      private var done = false
      private var nextRec: WarcRecord = null

      // any IOException (torn plain tail ends differently, but a
      // truncated/corrupt GZIP member surfaces as EOFException/ZipException
      // mid-read) is end-of-member, never task failure
      private def readByte(): Int =
        try in.read() catch { case _: java.io.IOException => -1 }

      private def readLine(): Option[String] = {
        var b = readByte()
        if (b < 0) return None
        val buf = new java.io.ByteArrayOutputStream(128)
        while (b >= 0 && b != '\n') { buf.write(b); b = readByte() }
        val arr = buf.toByteArray
        val len =
          if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1
          else arr.length
        Some(new String(arr, 0, len, java.nio.charset.StandardCharsets.UTF_8))
      }

      private def readFully(n: Int): Option[Array[Byte]] = {
        val out = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = try in.read(out, off, n - off)
            catch { case _: java.io.IOException => -1 }
          if (r < 0) return None
          off += r
        }
        Some(out)
      }

      private def advance(): Unit = {
        nextRec = null
        if (done) return
        // skip inter-record blank lines
        var first = readLine()
        while (first.isDefined && first.get.isEmpty) first = readLine()
        first match {
          case Some(version) if version.startsWith("WARC/") =>
            var warcType, recordId, targetUri = ""
            var contentLength = -1L
            var line = readLine()
            var torn = line.isEmpty
            while (line.isDefined && line.get.nonEmpty) {
              val l = line.get
              val i = l.indexOf(':')
              if (i > 0) {
                val k = l.substring(0, i).trim.toLowerCase
                val v = l.substring(i + 1).trim
                k match {
                  case "warc-type" => warcType = v
                  case "warc-record-id" => recordId = v
                  case "warc-target-uri" => targetUri = v
                  case "content-length" =>
                    contentLength =
                      try v.toLong catch { case _: Throwable => -1L }
                  case _ => ()
                }
              }
              line = readLine()
              torn = line.isEmpty // EOF inside the header block
            }
            if (torn || contentLength < 0 || contentLength > Int.MaxValue) {
              done = true; return
            }
            readFully(contentLength.toInt) match {
              case None => done = true // torn payload: stop, don't fail
              case Some(payload) =>
                nextRec = WarcRecord(warcType, recordId, targetUri,
                  contentLength, payload)
            }
          case _ => done = true // EOF or unparsable version line
        }
      }

      override def hasNext: Boolean = {
        if (nextRec == null) advance()
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }

  /** Parse one archive member, plain or GZIPPED (r15 verdict #3): real
    * Common Crawl ships `.warc.gz` with RECORD-LEVEL gzip members
    * (ISO 28500 §annex + RFC 1952 — one gzip member per record,
    * concatenated), which `GZIPInputStream` inflates transparently
    * across member boundaries; the 0x1f8b magic selects the inflating
    * path, everything else parses as plain text. A corrupt gzip header
    * yields an empty member (same best-effort contract as a torn tail). */
  private[graft] def parseMember(bytes: Array[Byte]): Iterator[WarcRecord] = {
    val base = new java.io.ByteArrayInputStream(bytes)
    if (bytes.length >= 2 &&
        (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      try parseStream(new java.util.zip.GZIPInputStream(base))
      catch { case _: java.io.IOException => Iterator.empty }
    } else parseStream(base)
  }

  /** Read every WARC record under `pathGlob` (e.g. a `*.warc` glob) —
    * one row per record: (warc_file, warc_type, record_id, target_uri,
    * content_length, payload binary). Map-only: member-per-task parse,
    * no shuffle, no driver state. Each member is materialized ONCE in
    * compressed form (`binaryFile` hands a whole file per row — ≤2 GB
    * by the JVM array limit); inflation and record framing then stream
    * at O(record) via [[parseStream]]. */
  def readRecords(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        parseMember(content).map(r =>
          (path, r.warcType, r.recordId, r.targetUri, r.contentLength,
            r.payload))
      }
      .toDF("warc_file", "warc_type", "record_id", "target_uri",
        "content_length", "payload")
  }

  /** The HTTP response body of a response-record payload: everything
    * after the first blank line (status line + HTTP headers precede it),
    * decoded per the response's OWN `Content-Type: ...; charset=` header
    * (r15 verdict #8 — the old binary→UTF-8 cast mangled Latin-1 bodies
    * into replacement chars BEFORE the header peel). Pure codegen'd
    * column expressions, two decode views of the same bytes:
    *
    *  - framing + charset sniff run on the ISO-8859-1 view — a lossless
    *    byte↔char bijection, and HTTP/1.1 headers are themselves
    *    ISO-8859-1 by spec (RFC 9110 §5.5), so the `\r\n\r\n` split and
    *    the regexp sniff are exact on ANY payload bytes;
    *  - a declared `charset=iso-8859-1` / `latin1` / `us-ascii` body IS
    *    that view's tail (ASCII ⊂ Latin-1), returned as-is;
    *  - everything else (explicit utf-8, or no declaration — the modern
    *    web's default) keeps the original UTF-8 cast with replacement-char
    *    semantics for undecodable bytes (media payloads must not throw).
    */
  def httpBody(payload: Column): Column = {
    val l1 = decode(payload, "ISO-8859-1")
    val i1 = instr(l1, "\r\n\r\n")
    val head = when(i1 > 0, substring(l1, lit(1), i1 - 1)).otherwise(lit(""))
    val cs = lower(regexp_extract(head,
      "(?i)content-type\\s*:[^\\r\\n]*;\\s*charset\\s*=\\s*\"?([A-Za-z0-9_\\-]+)", 1))
    val u8 = payload.cast("string")
    val iu = instr(u8, "\r\n\r\n")
    val bodyU8 = when(iu > 0, u8.substr(iu + 4, length(u8))).otherwise(u8)
    val bodyL1 = when(i1 > 0, l1.substr(i1 + 4, length(l1))).otherwise(l1)
    when(cs.isin("iso-8859-1", "iso8859-1", "latin-1", "latin1",
      "us-ascii", "ascii"), bodyL1)
      .otherwise(bodyU8)
  }

  /** One record's WARC/1.0 framing: strict CRLF line ends, Content-Length
    * in octets, blank-line separator. */
  private def recordBytes(r: WarcRecord): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: ${r.warcType}\r\n")
      .append(s"WARC-Record-ID: ${r.recordId}\r\n")
      .append(s"WARC-Target-URI: ${r.targetUri}\r\n")
      .append(s"Content-Length: ${r.payload.length}\r\n")
      .append("\r\n")
      .toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(
      head.length + r.payload.length + 4)
    out.write(head); out.write(r.payload)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** Serialize records into a plain WARC/1.0 member (the writer half —
    * used by fixtures and by pipelines that re-shard a filtered crawl). */
  def writeMember(records: Seq[WarcRecord],
      path: java.nio.file.Path): Unit = {
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path))
    try records.foreach(r => out.write(recordBytes(r)))
    finally out.close()
  }

  /** Per-record gzip stream whose deflater can be released eagerly:
    * `close()` would also close the shared underlying file stream, so
    * the writer calls finish() + release() instead. */
  private final class MemberGzStream(out: java.io.OutputStream)
      extends java.util.zip.GZIPOutputStream(out) {
    def release(): Unit = `def`.end()
  }

  /** Serialize records into a `.warc.gz` member with RECORD-LEVEL gzip
    * framing — each record its own gzip member, members concatenated —
    * the exact layout Common Crawl publishes (it makes any record
    * independently seekable given its archive offset). Parses back
    * byte-identical to the plain form through [[parseMember]]. */
  def writeMemberGz(records: Seq[WarcRecord],
      path: java.nio.file.Path): Unit = {
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path))
    try records.foreach { r =>
      // one GZIPOutputStream per record: finish() flushes that record's
      // gzip trailer without closing the underlying file stream, and
      // end() releases the Deflater's NATIVE buffers immediately —
      // without it each record's deflater lingers until the GC cleaner
      // runs, and a many-record re-shard accumulates native memory the
      // heap sizing never sees (ADVICE r16 #2). release() sits in a
      // finally so a write/finish failure can't leak the very native
      // buffers the eager end() exists to release (ADVICE r17 #1).
      val gz = new MemberGzStream(out)
      try { gz.write(recordBytes(r)); gz.finish() }
      finally gz.release()
    } finally out.close()
  }
}
