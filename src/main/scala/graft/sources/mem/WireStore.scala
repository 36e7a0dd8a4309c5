package graft.sources.mem

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.{InetAddress, ServerSocket, Socket}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal line-delimited wire protocol for the document store — the
  * WIRE-LEVEL client the reference talks to its stores with
  * (storage.scala:315-327, 644-658 open driver connections; the sandbox
  * has no external database, so the server end is the embedded store on a
  * loopback socket, and everything client-side is a REAL network client:
  * TCP connect, request serialization, typed row deserialization, one
  * connection per cursor).
  *
  * Request (one JSON line):
  *   {"op":"schema","collection":c}
  *   {"op":"count","collection":c}
  *   {"op":"rows","collection":c,"start":i,"end":j}
  *   {"op":"register","collection":c}  + schema-json line + row lines + blank
  * Response:
  *   schema   -> one line: Spark StructType.json (public round-trip form)
  *   count    -> one line: decimal integer
  *   rows     -> one JSON array line per row, then one blank line
  *   register -> one line: "ok"
  * Errors -> one line starting with "!" and the message; clients throw.
  *
  * Supported field types: boolean, byte/short/int/long, float/double,
  * string, timestamp (wire form: epoch micros), date (wire form: epoch
  * days). Anything else fails loudly server-side — a real driver would
  * extend the codec, and silent coercion is how wrong answers hide.
  */
object WireCodec {
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def writeValue(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case b: Boolean => sb.append(if (b) "true" else "false")
    case n: Byte => sb.append(n.toInt)
    case n: Short => sb.append(n.toInt)
    case n: Int => sb.append(n)
    case n: Long => sb.append(n)
    case n: Float =>
      // widen through the float's exact decimal form so the reader's
      // toFloat reproduces the identical bits
      sb.append(n.toString)
    case n: Double => sb.append(n)
    case s: String => sb.append('"').append(esc(s)).append('"')
    case t: java.sql.Timestamp =>
      sb.append(t.getTime / 1000L * 1000000L + t.getNanos / 1000L)
    case d: java.sql.Date => sb.append(d.toLocalDate.toEpochDay)
    case other => throw new IllegalArgumentException(
      s"wire codec: unsupported value type ${other.getClass.getName}")
  }

  def writeRow(r: Row): String = {
    val sb = new StringBuilder("[")
    var i = 0
    while (i < r.length) {
      if (i > 0) sb.append(',')
      writeValue(r.get(i), sb)
      i += 1
    }
    sb.append(']').toString
  }

  /** schema-directed typed parse of one row line. */
  def readRow(line: String, schema: StructType): Row = {
    var i = 1 // skip '['
    val n = line.length
    val out = new Array[Any](schema.length)
    var f = 0
    while (f < schema.length) {
      if (line.charAt(i) == ',') i += 1
      val token: Either[String, String] = // Left = raw token, Right = string
        if (line.charAt(i) == '"') {
          i += 1
          val sb = new StringBuilder
          while (line.charAt(i) != '"') {
            val c = line.charAt(i)
            if (c == '\\') {
              line.charAt(i + 1) match {
                case '"' => sb.append('"'); i += 2
                case '\\' => sb.append('\\'); i += 2
                case 'u' =>
                  sb.append(Integer.parseInt(line.substring(i + 2, i + 6), 16).toChar)
                  i += 6
                case other => throw new IllegalArgumentException(
                  s"wire codec: bad escape '\\$other'")
              }
            } else { sb.append(c); i += 1 }
          }
          i += 1 // closing quote
          Right(sb.toString)
        } else {
          val st = i
          while (i < n && line.charAt(i) != ',' && line.charAt(i) != ']') i += 1
          Left(line.substring(st, i))
        }
      out(f) = (token, schema(f).dataType) match {
        case (Left("null"), _) => null
        case (Left(t), BooleanType) => t.toBoolean
        case (Left(t), ByteType) => t.toByte
        case (Left(t), ShortType) => t.toShort
        case (Left(t), IntegerType) => t.toInt
        case (Left(t), LongType) => t.toLong
        case (Left(t), FloatType) => t.toFloat
        case (Left(t), DoubleType) => t.toDouble
        case (Left(t), TimestampType) =>
          val micros = t.toLong
          val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          ts
        case (Left(t), DateType) =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(t.toLong))
        case (Right(s), StringType) => s
        case (tok, dt) => throw new IllegalArgumentException(
          s"wire codec: cannot read $tok as $dt")
      }
      f += 1
    }
    Row.fromSeq(out.toIndexedSeq)
  }
}

/** The server end: serves MemStore collections over loopback TCP. One
  * request per connection (the per-cursor connection shape — each
  * partition reader dials its own socket, like a driver opens a cursor). */
class MemWireServer private (server: ServerSocket, acceptor: Thread) {
  def port: Int = server.getLocalPort
  def close(): Unit = {
    try server.close() catch { case _: Throwable => () }
  }
}

object MemWireServer {
  private val field = """"(\w+)":("?[^",}]*"?)""".r

  def start(): MemWireServer = {
    val server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
    val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val h = new Thread(() => handle(sock), "graft-wire-conn")
          h.setDaemon(true)
          h.start()
        }
      } catch { case _: Throwable => () } // closed
    }, "graft-wire-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    new MemWireServer(server, acceptor)
  }

  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(
      sock.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
    val out = new BufferedWriter(new OutputStreamWriter(
      sock.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
    def reply(lines: Iterator[String]): Unit = {
      lines.foreach { l => out.write(l); out.write('\n') }
      out.flush()
    }
    try {
      val req = in.readLine()
      if (req == null) return
      val fields = field.findAllMatchIn(req)
        .map(m => m.group(1) -> m.group(2).stripPrefix("\"").stripSuffix("\"")).toMap
      val op = fields.getOrElse("op", "?")
      val coll = fields.getOrElse("collection", "?")
      op match {
        case "schema" =>
          reply(Iterator.single(MemStore.schemaOf(coll).json))
        case "count" =>
          reply(Iterator.single(MemStore.rowsOf(coll).length.toString))
        case "rows" =>
          val start = fields.get("start").map(_.toInt).getOrElse(0)
          val end = fields.get("end").map(_.toInt)
            .getOrElse(MemStore.rowsOf(coll).length)
          reply(MemStore.rowsOf(coll).iterator.slice(start, end)
            .map(WireCodec.writeRow) ++ Iterator.single(""))
        case "register" =>
          val schema = DataType.fromJson(in.readLine()).asInstanceOf[StructType]
          val rows = Iterator.continually(in.readLine())
            .takeWhile(l => l != null && l.nonEmpty)
            .map(WireCodec.readRow(_, schema)).toArray
          MemStore.registerRaw(coll, schema, rows)
          reply(Iterator.single("ok"))
        case other =>
          reply(Iterator.single(s"!unknown op '$other'"))
      }
    } catch {
      case e: Throwable =>
        try reply(Iterator.single(s"!${e.getMessage}")) catch { case _: Throwable => () }
    } finally {
      try sock.close() catch { case _: Throwable => () }
    }
  }
}

/** The wire-level [[StoreClient]]: every operation is a TCP round-trip to
  * the row server — partition readers (which may run in executor tasks)
  * each dial their own connection, exactly like a database driver opens a
  * cursor per shard. Only `host`/`port` serialize into the task closure. */
class SocketStoreClient(host: String, port: Int) extends StoreClient {
  private def call[A](request: String)(read: BufferedReader => A): A = {
    val sock = new Socket(host, port)
    try {
      val out = new BufferedWriter(new OutputStreamWriter(
        sock.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
      val in = new BufferedReader(new InputStreamReader(
        sock.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
      out.write(request); out.write('\n'); out.flush()
      read(in)
    } finally sock.close()
  }

  private def callOneLine(request: String): String =
    call(request) { in =>
      val l = in.readLine()
      if (l == null) throw new java.io.IOException("wire: connection closed")
      if (l.startsWith("!")) throw new java.io.IOException(s"wire: ${l.drop(1)}")
      l
    }

  def hasCollection(name: String): Boolean =
    try { schemaOf(name); true } catch { case _: Throwable => false }

  def schemaOf(name: String): StructType =
    SocketStoreClient.schemaCache.getOrElseUpdate((host, port, name),
      DataType.fromJson(
        callOneLine(s"""{"op":"schema","collection":"$name"}"""))
        .asInstanceOf[StructType])

  def rowCount(name: String): Int =
    callOneLine(s"""{"op":"count","collection":"$name"}""").toInt

  def rows(name: String, start: Int, end: Int): Iterator[Row] = {
    val schema = schemaOf(name)
    // materialize the page inside the connection scope (cursor semantics:
    // the slice is bounded by construction — partition planning sized it)
    call(s"""{"op":"rows","collection":"$name","start":$start,"end":$end}""") { in =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      var l = in.readLine()
      while (l != null && l.nonEmpty) {
        if (l.startsWith("!")) throw new java.io.IOException(s"wire: ${l.drop(1)}")
        buf += WireCodec.readRow(l, schema)
        l = in.readLine()
      }
      buf.iterator
    }
  }

  def registerDerived(name: String, schema: StructType, rs: Array[Row]): Unit = {
    val req = new StringBuilder(s"""{"op":"register","collection":"$name"}""")
    req.append('\n').append(schema.json)
    rs.foreach(r => req.append('\n').append(WireCodec.writeRow(r)))
    req.append('\n') // blank terminator
    callOneLine(req.toString)
    SocketStoreClient.schemaCache((host, port, name)) = schema
  }

  def clientKey: String = s"wire:$host:$port"
}

object SocketStoreClient {
  private val schemaCache = TrieMap[(String, Int, String), StructType]()
}
