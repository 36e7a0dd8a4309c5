package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's pushdown query DSL re-expressed as a `Column` compiler.
  *
  * Reference shape (src/main/scala/mongo/package.scala:82-120 field operators,
  * src/main/scala/dsl/package.scala:23-101 free-monad fold into
  * `MongoReadSettings`/`CassandraReadSettings`): a closed algebra of typed
  * comparison predicates ($eq/$gt/$gte/$lt/$lte/$ne/$in/$nin/$all), boolean
  * connectives, and sort/skip/limit, interpreted into the native DB query so
  * filters never run client-side.
  *
  * Spark-first translation: the algebra compiles to Catalyst `Column`
  * expressions; "pushdown" is then *free* — Catalyst's `PushDownPredicates`
  * and the parquet DataSource push the compiled filters into the scan, and
  * column pruning (absent in the reference, SURVEY.md §2.2) comes with it.
  * The free-monad machinery is intentionally NOT rebuilt: a `Pred` tree is
  * already a deferred, composable program, and Catalyst is its interpreter.
  */
sealed trait Pred {
  /** Compile to a Catalyst boolean expression. */
  def column: Column
  def &&(other: Pred): Pred = And(this, other)
  def ||(other: Pred): Pred = Or(this, other)
  def unary_! : Pred = Not(this)
}

final case class Eq(field: String, value: Column) extends Pred {
  def column: Column = col(field) === value
}
final case class Ne(field: String, value: Column) extends Pred {
  def column: Column = col(field) =!= value
}
final case class Gt(field: String, value: Column) extends Pred {
  def column: Column = col(field) > value
}
final case class Gte(field: String, value: Column) extends Pred {
  def column: Column = col(field) >= value
}
final case class Lt(field: String, value: Column) extends Pred {
  def column: Column = col(field) < value
}
final case class Lte(field: String, value: Column) extends Pred {
  def column: Column = col(field) <= value
}
final case class In(field: String, values: Seq[Column]) extends Pred {
  def column: Column = col(field).isin(values: _*)
}
final case class Nin(field: String, values: Seq[Column]) extends Pred {
  def column: Column = !col(field).isin(values: _*)
}
/** Array field contains ALL of the given values (Mongo `$all`,
  * reference mongo/package.scala:89). */
final case class All(field: String, values: Seq[Column]) extends Pred {
  def column: Column =
    values.map(v => array_contains(col(field), v)).reduce(_ && _)
}
final case class And(left: Pred, right: Pred) extends Pred {
  def column: Column = left.column && right.column
}
final case class Or(left: Pred, right: Pred) extends Pred {
  def column: Column = left.column || right.column
}
final case class Not(p: Pred) extends Pred {
  def column: Column = !p.column
}
/** Mongo `$exists`: field presence. The reference parser lists `$not`/
  * `$exists` as its own TODO (mqlparser/package.scala:98) — this goes
  * beyond parity. Columnar mapping: a schema column always "exists", so
  * presence means NOT NULL (Mongo's missing-field ≈ SQL NULL); SQL
  * three-valued logic applies throughout the algebra (a `Not` over a
  * NULL comparison filters the row, it does not resurrect it). */
final case class Exists(field: String, expected: Boolean) extends Pred {
  def column: Column =
    if (expected) col(field).isNotNull else col(field).isNull
}
/** Raw SQL predicate fragment (reference's raw-CQL `select()`,
  * src/main/scala/dsl/package.scala:83-86) — parsed by Catalyst. */
final case class RawSql(sql: String) extends Pred {
  def column: Column = expr(sql)
}

/** Closed scalar literal set, mirroring the reference's `MongoTypes[T]`
  * typeclass (src/main/scala/mongo/package.scala:123-129): Int, Long, Double,
  * String, Boolean, timestamp/date. Compile-time evidence keeps the DSL
  * surface typed without restricting the Catalyst literal underneath. */
sealed trait DslType[T] { def toLit(v: T): Column }
object DslType {
  private class Inst[T] extends DslType[T] { def toLit(v: T): Column = lit(v) }
  implicit val intT: DslType[Int] = new Inst[Int]
  implicit val longT: DslType[Long] = new Inst[Long]
  implicit val doubleT: DslType[Double] = new Inst[Double]
  implicit val stringT: DslType[String] = new Inst[String]
  implicit val boolT: DslType[Boolean] = new Inst[Boolean]
  implicit val tsT: DslType[java.sql.Timestamp] = new Inst[java.sql.Timestamp]
  implicit val dateT: DslType[java.sql.Date] = new Inst[java.sql.Date]
}

/** A predicate that remembers its field so range operators chain:
  * `"l_quantity" $gte 10 $lte 15` == BETWEEN, the reference's map-merge
  * implicit AND (dsl/package.scala:62-69; test JoinMongoSpec.scala:41-45). */
final case class FieldPred(field: String, pred: Pred) extends Pred {
  def column: Column = pred.column
  private def chain(p: Pred): FieldPred = FieldPred(field, And(pred, p))
  def $gt[T](v: T)(implicit t: DslType[T]): FieldPred = chain(Gt(field, t.toLit(v)))
  def $gte[T](v: T)(implicit t: DslType[T]): FieldPred = chain(Gte(field, t.toLit(v)))
  def $lt[T](v: T)(implicit t: DslType[T]): FieldPred = chain(Lt(field, t.toLit(v)))
  def $lte[T](v: T)(implicit t: DslType[T]): FieldPred = chain(Lte(field, t.toLit(v)))
  def $ne[T](v: T)(implicit t: DslType[T]): FieldPred = chain(Ne(field, t.toLit(v)))
}

/** String-to-field lift (reference's implicit `f2b`,
  * mongo/package.scala:117). Dotted names address nested structs, as the
  * reference's dotted paths address nested documents
  * (mqlparser/package.scala:146-156). */
final class QField(val name: String) extends AnyVal {
  private def fp(p: Pred): FieldPred = FieldPred(name, p)
  def $eq[T](v: T)(implicit t: DslType[T]): FieldPred = fp(Eq(name, t.toLit(v)))
  def $ne[T](v: T)(implicit t: DslType[T]): FieldPred = fp(Ne(name, t.toLit(v)))
  def $gt[T](v: T)(implicit t: DslType[T]): FieldPred = fp(Gt(name, t.toLit(v)))
  def $gte[T](v: T)(implicit t: DslType[T]): FieldPred = fp(Gte(name, t.toLit(v)))
  def $lt[T](v: T)(implicit t: DslType[T]): FieldPred = fp(Lt(name, t.toLit(v)))
  def $lte[T](v: T)(implicit t: DslType[T]): FieldPred = fp(Lte(name, t.toLit(v)))
  def $in[T](vs: Seq[T])(implicit t: DslType[T]): FieldPred = fp(In(name, vs.map(t.toLit)))
  def $nin[T](vs: Seq[T])(implicit t: DslType[T]): FieldPred = fp(Nin(name, vs.map(t.toLit)))
  def $all[T](vs: Seq[T])(implicit t: DslType[T]): FieldPred = fp(All(name, vs.map(t.toLit)))
  def $exists(v: Boolean): FieldPred = fp(Exists(name, v))
}

object Order extends Enumeration {
  /** Reference `Order.Ascending = 1 / Descending = -1`
    * (mongo/package.scala:60-63). */
  val Ascending, Descending = Value
}

/** A compiled query spec: predicate + sort/skip/limit + projection — the
  * Spark analogue of the reference's `MongoReadSettings(query, sort, limit,
  * skip)` (join/mongo/package.scala:19-20). `apply` interprets it against a
  * DataFrame; every part lands in the Catalyst plan (filters/projection reach
  * the scan; sort+limit fuse to `TakeOrderedAndProject`). */
final case class Q(
    pred: Option[Pred] = None,
    sortKeys: Seq[(String, Order.Value)] = Nil,
    skipN: Option[Int] = None,
    limitN: Option[Int] = None,
    cols: Seq[String] = Nil) {
  def where(p: Pred): Q = copy(pred = pred.map(_ && p).orElse(Some(p)))
  def sort(keys: (String, Order.Value)*): Q = copy(sortKeys = keys)
  def skip(n: Int): Q = copy(skipN = Some(n))
  def limit(n: Int): Q = copy(limitN = Some(n))
  def select(cs: String*): Q = copy(cols = cs)

  def apply(df: DataFrame): DataFrame = {
    var out = df
    pred.foreach(p => out = out.where(p.column))
    if (sortKeys.nonEmpty)
      out = out.orderBy(sortKeys.map {
        case (f, Order.Ascending) => col(f).asc
        case (f, Order.Descending) => col(f).desc
      }: _*)
    skipN.foreach(n => out = out.offset(n))
    limitN.foreach(n => out = out.limit(n))
    // Projection last (as in the reference, where full records flow and
    // projection is post-hoc, SURVEY.md §2.2) — Catalyst prunes columns
    // through sort/limit down to the scan anyway.
    if (cols.nonEmpty) out = out.select(cols.map(col): _*)
    out
  }
}

object Dsl {
  import scala.language.implicitConversions
  implicit def stringToField(s: String): QField = new QField(s)
  def q: Q = Q()

  /** P10 — foreign-key binding for the parameterized inner side of a join
    * (reference `fk[T](name, v)`, dsl/package.scala:84,91-92). In Spark the
    * bound key is just an equality predicate; when both sides bind the same
    * key it becomes the equi-join condition (see Joins.inner). */
  def fk[T](field: String, v: T)(implicit t: DslType[T]): FieldPred =
    new QField(field) $eq v

  /** P15 — the reference's `|>` pipe (apply an arbitrary streaming stage,
    * channel/package.scala:50-55) is `Dataset.transform`; this implicit
    * restores the operator spelling. */
  implicit final class PipeOps(private val df: org.apache.spark.sql.DataFrame) extends AnyVal {
    def |>(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.transform(f)
  }
}
