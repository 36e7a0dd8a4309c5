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

  /** Parse the WARC/1.0 plain-text framing out of one archive member:
    * per record a `WARC/1.0` version line, `Name: Value` header lines up
    * to a blank line (CRLF per spec; lone LF tolerated — real crawls
    * contain both), exactly `Content-Length` payload octets, then the
    * blank-line record separator. Records with no parsable version line
    * or a truncated payload end the member (crawl members are
    * best-effort concatenations — a torn tail must not fail the task). */
  private[graft] def parseMember(bytes: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = 0
      private var nextRec: WarcRecord = null

      private def readLine(): String = {
        val start = pos
        while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        val end =
          if (pos > start && bytes(pos - 1) == '\r') pos - 1 else pos
        if (pos < bytes.length) pos += 1 // consume the \n
        new String(bytes, start, end - start,
          java.nio.charset.StandardCharsets.UTF_8)
      }

      private def advance(): Unit = {
        nextRec = null
        // skip inter-record blank lines
        while (pos < bytes.length &&
            (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
        if (pos >= bytes.length) return
        val version = readLine()
        if (!version.startsWith("WARC/")) { pos = bytes.length; return }
        var warcType, recordId, targetUri = ""
        var contentLength = -1L
        var line = readLine()
        while (line.nonEmpty) {
          val i = line.indexOf(':')
          if (i > 0) {
            val k = line.substring(0, i).trim.toLowerCase
            val v = line.substring(i + 1).trim
            k match {
              case "warc-type" => warcType = v
              case "warc-record-id" => recordId = v
              case "warc-target-uri" => targetUri = v
              case "content-length" =>
                contentLength = try v.toLong catch { case _: Throwable => -1L }
              case _ => ()
            }
          }
          line = readLine()
        }
        if (contentLength < 0 || pos + contentLength > bytes.length) {
          pos = bytes.length; return // torn record: stop, don't fail
        }
        val payload = java.util.Arrays.copyOfRange(
          bytes, pos, pos + contentLength.toInt)
        pos += contentLength.toInt
        nextRec =
          WarcRecord(warcType, recordId, targetUri, contentLength, payload)
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

  /** Read every WARC record under `pathGlob` (e.g. a `*.warc` glob) —
    * one row per record: (warc_file, warc_type, record_id, target_uri,
    * content_length, payload binary). Map-only: member-per-task parse,
    * no shuffle, no driver state. */
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
    * after the first blank line (status line + HTTP headers precede it).
    * Pure codegen'd column expression — binary→UTF-8 cast, one instr,
    * one substr; payloads without an HTTP header block pass through. */
  def httpBody(payload: Column): Column = {
    val s = payload.cast("string")
    val i = instr(s, "\r\n\r\n")
    when(i > 0, s.substr(i + 4, length(s))).otherwise(s)
  }

  /** Serialize records into WARC/1.0 framing (the writer half — used by
    * fixtures and by pipelines that re-shard a filtered crawl): strict
    * CRLF line ends, Content-Length in octets, blank-line separator. */
  def writeMember(records: Seq[WarcRecord],
      path: java.nio.file.Path): Unit = {
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path))
    try {
      val crlf = "\r\n".getBytes
      records.foreach { r =>
        val head = new StringBuilder()
          .append("WARC/1.0\r\n")
          .append(s"WARC-Type: ${r.warcType}\r\n")
          .append(s"WARC-Record-ID: ${r.recordId}\r\n")
          .append(s"WARC-Target-URI: ${r.targetUri}\r\n")
          .append(s"Content-Length: ${r.payload.length}\r\n")
          .append("\r\n")
        out.write(head.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        out.write(r.payload)
        out.write(crlf); out.write(crlf)
      }
    } finally out.close()
  }
}
