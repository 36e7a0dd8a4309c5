package graft.model

import java.sql.Timestamp

/** Case-class row models for the testdata tables.
  *
  * The reference maps records to case classes by shapeless-generic
  * field-order derivation returning `Option[T]`
  * (src/main/scala/mongotypes/package.scala:107-137 Mongo, :174-205
  * Cassandra; exercised test/join/JoinMongoSpec.scala:216-231). Spark's
  * product `Encoder` (`ds.as[T]`) is the industrial version of that
  * derivation: by-name field mapping, codegen'd serializers, nullable
  * columns instead of `Option`-wrapping whole rows (SURVEY.md §1.2).
  */
final case class OrderRow(
    o_orderkey: Long,
    o_custkey: Long,
    o_orderstatus: String,
    o_totalprice: Double,
    o_orderdate: Timestamp,
    o_orderpriority: String)

final case class LineitemRow(
    l_orderkey: Long,
    l_partkey: Long,
    l_suppkey: Long,
    l_linenumber: Int,
    l_quantity: Double,
    l_extendedprice: Double,
    l_discount: Double,
    l_tax: Double,
    l_returnflag: String,
    l_linestatus: String,
    l_shipdate: Timestamp)

final case class PartRow(
    p_partkey: Long,
    p_name: String,
    p_brand: String,
    p_type: String,
    p_size: Int,
    p_retailprice: Double)

/** events.ts is normalized to TimestampType by `Tables.tsFromNanos`
  * (schema-adaptive: the raw parquet has shipped both Long nanos and
  * timestamp[us]); apply it before `.as[EventRow]`. */
final case class EventRow(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

final case class DocumentRow(
    doc_id: Long,
    text: String,
    lang: String,
    source: String,
    n_chars: Long)

final case class EmbeddingRow(
    vec_id: Long,
    embedding: Array[Float],
    label: Int)

/** Ragged-document model (§1.2 dynamic schema): Option fields absorb
  * missing/null values — the Encoder upgrade of the reference's
  * Option[T]-on-parse-failure semantics. */
final case class RaggedDoc(
    id: Long,
    name: String,
    producerNum: Option[Long],
    flag: Option[Boolean])
