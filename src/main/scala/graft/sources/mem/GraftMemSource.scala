package graft.sources.mem

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector over an in-process document store — the Spark
  * shape of the reference's NoSQL connectors.
  *
  * The reference's core trick is pushdown query construction: DSL filters
  * compile into the native `find(query)`/CQL so predicates never run
  * client-side (reference: src/main/scala/storage.scala:597,650-652;
  * SURVEY.md §2.2). In DataSource V2 that contract is
  * `SupportsPushDownFilters`/`SupportsPushDownRequiredColumns`: Catalyst
  * hands the connector its filters and projection, the connector serves
  * only matching rows/columns — exactly what a Mongo/Cassandra
  * implementation would send over the wire. The in-memory store plays the
  * embedded test databases the reference uses
  * (mongo-java-server MemoryBackend / cassandra-unit, SURVEY.md §5); a
  * production store would swap `MemStore` for a client, nothing else
  * changes.
  *
  * Usage: `MemStore.register("langs", df)` then
  * `spark.read.format("graft.sources.mem.GraftMemSource").option("collection", "langs").load()`.
  */
object MemStore {
  private val collections = TrieMap[String, (StructType, Array[Row])]()

  /** Last filters each collection scan actually applied store-side —
    * instrumentation so tests can prove pushdown happened. */
  val lastPushed = TrieMap[String, Seq[Filter]]()

  /** Last query options each collection scan observed store-side
    * (maxTimeMS / readPreference — the reference's cursor options,
    * channel/package.scala:241 `maxTimeMS` and :276 `readPreference`):
    * instrumentation proving the options reach the store, like
    * `lastPushed` proves pushdown. */
  val lastOptions = TrieMap[String, Map[String, String]]()

  /** Error-injection modes, mirroring the reference's failing-producer
    * modules (`MongoObsCursorError`/`MongoObsFetchError`,
    * reference join/mongo/package.scala:40-41; tested
    * JoinMongoSpec.scala:123-214): CursorError fails at reader creation,
    * FetchError fails mid-iteration — both must surface as task/query
    * failure, never as silent truncation. */
  sealed trait FailureMode
  case object CursorError extends FailureMode
  final case class FetchError(afterRows: Int) extends FailureMode
  /** Per-fetch latency injection — lets O4 deadline tests exceed a small
    * positive maxTimeMS DETERMINISTICALLY (maxTimeMS=0 now means
    * "unbounded", MongoDB semantics, so expiry can no longer be forced
    * with a zero deadline). */
  final case class SlowFetch(delayMs: Long) extends FailureMode
  val failureModes = TrieMap[String, FailureMode]()

  def register(name: String, df: DataFrame): Unit =
    collections(name) = (df.schema, df.collect())

  def schemaOf(name: String): StructType =
    collections.getOrElse(name,
      throw new IllegalArgumentException(s"unknown collection '$name'"))._1

  def rowsOf(name: String): Array[Row] = collections(name)._2

  /** Store-side filter evaluation — the "native query" of the fake store. */
  def eval(row: Row, schema: StructType, f: Filter): Boolean = {
    def v(attr: String): Any = row.get(schema.fieldIndex(attr))
    def cmp(attr: String, x: Any): Int = {
      val a = v(attr)
      (a, x) match {
        case (a: Number, x: Number) =>
          java.lang.Double.compare(a.doubleValue(), x.doubleValue())
        case (a: String, x: String) => a.compareTo(x)
        case (a: Comparable[Any] @unchecked, x) => a.compareTo(x)
      }
    }
    f match {
      case EqualTo(a, x) => v(a) == x
      case GreaterThan(a, x) => v(a) != null && cmp(a, x) > 0
      case GreaterThanOrEqual(a, x) => v(a) != null && cmp(a, x) >= 0
      case LessThan(a, x) => v(a) != null && cmp(a, x) < 0
      case LessThanOrEqual(a, x) => v(a) != null && cmp(a, x) <= 0
      case In(a, xs) => xs.contains(v(a))
      case IsNull(a) => v(a) == null
      case IsNotNull(a) => v(a) != null
      case And(l, r) => eval(row, schema, l) && eval(row, schema, r)
      case _ => true // unsupported filters are never pushed (see pushFilters)
    }
  }

  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
        _: LessThanOrEqual | _: In | _: IsNull | _: IsNotNull => true
    case And(l, r) => supported(l) && supported(r)
    case _ => false
  }
}

class GraftMemSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemStore.schemaOf(options.get("collection"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemTable(properties.get("collection"), schema)
}

class MemTable(collection: String, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft-mem:$collection"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // O4/T7 — query-scoped cursor options, mirroring the reference's
    // builder surface (channel/package.scala:241 maxTimeMS, :276
    // readPreference): maxTimeMS bounds reader wall time store-side;
    // readPreference is recorded (an embedded store has one replica — a
    // real connector would route by it, as Mongo drivers do).
    // maxTimeMS=0 means "no time limit", matching MongoDB cursor.maxTimeMS
    // semantics (the reference forwards the raw option to the driver, so 0
    // disables the deadline there too)
    val maxTimeMs =
      Option(options.get("maxTimeMS")).map(_.toLong).filter(_ > 0)
    val readPreference = options.getOrDefault("readPreference", "primary")
    new MemScanBuilder(collection, schema, maxTimeMs, readPreference)
  }
}

class MemScanBuilder(
    collection: String,
    fullSchema: StructType,
    maxTimeMs: Option[Long],
    readPreference: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  /** Accept what the store can evaluate; hand the rest back to Spark
    * (Catalyst keeps a residual Filter node for those). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(MemStore.supported)
    pushed = sup
    unsup
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new MemScan(collection, fullSchema, required, pushed, maxTimeMs, readPreference)
}

class MemScan(
    collection: String,
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    maxTimeMs: Option[Long],
    readPreference: String) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-mem:$collection PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}" +
      maxTimeMs.map(ms => s", maxTimeMS: $ms").getOrElse("") +
      s", readPreference: $readPreference"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = MemStore.rowsOf(collection).length
    val slices = 4 // fixed fan-out; a real connector splits by shard/token range
    val step = math.max(1, math.ceil(n / slices.toDouble).toInt)
    (0 until n by step).map(start =>
      MemInputPartition(collection, start, math.min(n, start + step))
        .asInstanceOf[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    MemStore.lastPushed(collection) = pushed.toSeq
    MemStore.lastOptions(collection) =
      maxTimeMs.map(ms => "maxTimeMS" -> ms.toString).toMap +
        ("readPreference" -> readPreference)
    new MemReaderFactory(fullSchema, required, pushed, maxTimeMs)
  }
}

case class MemInputPartition(collection: String, start: Int, end: Int)
    extends InputPartition

class MemReaderFactory(
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    maxTimeMs: Option[Long]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MemInputPartition]
    val mode = MemStore.failureModes.get(p.collection)
    if (mode.contains(MemStore.CursorError))
      throw new java.io.IOException(
        s"graft-mem cursor creation failed for '${p.collection}' (injected)")
    new PartitionReader[InternalRow] {
      private var served = 0
      // O4 maxTimeMS: a server-side cursor deadline — exceeded == query
      // error, never silent truncation (same contract as the reference's
      // Mongo cursor timeout).
      private val deadlineNanos =
        maxTimeMs.map(ms => System.nanoTime() + ms * 1000000L)
      private val toInternal = ExpressionEncoder(RowEncoder.encoderFor(required))
        .createSerializer()
      private val idx = required.fields.map(f => fullSchema.fieldIndex(f.name))
      private val it = MemStore.rowsOf(p.collection)
        .slice(p.start, p.end)
        .iterator
        .filter(r => pushed.forall(MemStore.eval(r, fullSchema, _))) // store-side
        .map(r => Row.fromSeq(idx.toIndexedSeq.map(r.get)))          // store-side projection
      private var current: InternalRow = _
      override def next(): Boolean = {
        mode match {
          case Some(MemStore.SlowFetch(ms)) => Thread.sleep(ms)
          case _ => ()
        }
        deadlineNanos.foreach { d =>
          if (System.nanoTime() > d)
            throw new java.io.IOException(
              s"graft-mem query on '${p.collection}' exceeded maxTimeMS=${maxTimeMs.get}")
        }
        mode match {
          case Some(MemStore.FetchError(n)) if served >= n =>
            throw new java.io.IOException(
              s"graft-mem fetch failed for '${p.collection}' after $served rows (injected)")
          case _ => ()
        }
        if (it.hasNext) { current = toInternal(it.next()).copy(); served += 1; true }
        else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
