package graft.mql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

import scala.util.parsing.combinator.JavaTokenParsers

import graft.dsl._

/** Parse failure — fail-fast, mirroring the reference parser's throw on
  * syntax error (reference: src/main/scala/mongo/mqlparser/package.scala:232)
  * and the failed-Task error channel of the channel builder
  * (mongo/channel/package.scala:268). */
final class MqlParseException(msg: String) extends IllegalArgumentException(msg)

/** MQL (Mongo-JSON query text) → [[graft.dsl.Pred]] compiler.
  *
  * The reference ships a parser-combinator grammar over Mongo query JSON
  * (src/main/scala/mongo/mqlparser/package.scala:67-235): int/double/bool/
  * string/date scalars, int/double/string arrays, dotted field paths, range
  * and set operators, `$and`/`$or` arrays, and nested `{f: {$gt: x, $lt: y}}`
  * objects (implicit AND).
  *
  * Spark-first: rather than compiling to a `BasicDBObject` for a remote
  * store, the same grammar compiles to the `Pred` algebra, which compiles to
  * Catalyst `Column`s — so a parsed MQL string gets predicate pushdown,
  * codegen, and column pruning like any native filter. (For SQL text, use
  * `spark.sql` — Catalyst's parser; MQL is kept only as the reference's
  * surface syntax.)
  *
  * Dates parse with the reference's format `dd MMM yyyy hh:mm:ss:SSS a z`
  * (mongo/package.scala:133).
  */
object MqlParser extends JavaTokenParsers {

  private def unquote(s: String): String = {
    val body = s.substring(1, s.length - 1)
    // JSON-style escapes; the reference grammar only needs quotes/backslash.
    body.replace("\\\"", "\"").replace("\\\\", "\\")
  }

  private val datePattern = """\d{1,2} [A-Za-z]{3} \d{4} .*""".r

  private def tryDate(s: String): Option[java.sql.Timestamp] =
    s match {
      case datePattern() =>
        val fmt = new java.text.SimpleDateFormat(
          "dd MMM yyyy hh:mm:ss:SSS a z", java.util.Locale.ENGLISH)
        fmt.setLenient(false)
        try Some(new java.sql.Timestamp(fmt.parse(s).getTime))
        catch { case _: java.text.ParseException => None }
      case _ => None
    }

  private sealed trait MqlVal
  private final case class Scalar(c: Column) extends MqlVal
  private final case class Arr(cs: List[Column]) extends MqlVal

  private def key: Parser[String] =
    stringLiteral ^^ unquote | """[$a-zA-Z_][a-zA-Z0-9_.$]*""".r

  private def scalar: Parser[Column] =
    floatingPointNumber ^^ { s =>
      if (s.exists(c => c == '.' || c == 'e' || c == 'E')) lit(s.toDouble)
      else {
        val l = s.toLong
        if (l.isValidInt) lit(l.toInt) else lit(l)
      }
    } |
      "true" ^^^ lit(true) |
      "false" ^^^ lit(false) |
      stringLiteral ^^ { s =>
        val str = unquote(s)
        tryDate(str).map(lit(_)).getOrElse(lit(str))
      }

  private def value: Parser[MqlVal] =
    scalar ^^ (Scalar(_)) |
      ("[" ~> repsep(scalar, ",") <~ "]") ^^ (Arr(_))

  private def opEntry(field: String): Parser[Pred] = key into {
    // $not takes an operator document ({f: {$not: {$gt: 5}}}) and $exists a
    // bare boolean — both beyond the reference parser's own TODO list
    // (mqlparser/package.scala:98). $not composes over any condition
    // (including nested $not) with SQL three-valued semantics (see
    // [[graft.dsl.Exists]] scaladoc). `key` unquotes, so both spellings
    // ({"$not": ...} and {$not: ...}) land here.
    case "$not" => ":" ~> condition(field) ^^ (p => Not(p): Pred)
    case "$exists" =>
      ":" ~> ("true" ^^^ true | "false" ^^^ false) ^^
        (b => Exists(field, b): Pred)
    case op => ":" ~> value ^^ { v =>
      (op, v) match {
        case ("$eq", Scalar(x)) => Eq(field, x)
        case ("$ne", Scalar(x)) => Ne(field, x)
        case ("$gt", Scalar(x)) => Gt(field, x)
        case ("$gte", Scalar(x)) => Gte(field, x)
        case ("$lt", Scalar(x)) => Lt(field, x)
        case ("$lte", Scalar(x)) => Lte(field, x)
        case ("$in", Arr(xs)) => In(field, xs)
        case ("$nin", Arr(xs)) => Nin(field, xs)
        case ("$all", Arr(xs)) => All(field, xs)
        case _ =>
          throw new MqlParseException(s"unsupported operator '$op' on field '$field'")
      }
    }
  }

  private def condition(field: String): Parser[Pred] =
    ("{" ~> rep1sep(opEntry(field), ",") <~ "}") ^^ (_.reduceLeft(And(_, _): Pred)) |
      scalar ^^ (v => Eq(field, v): Pred)

  private def pair: Parser[Pred] = key into {
    case "$and" => ":" ~> ("[" ~> rep1sep(query, ",") <~ "]") ^^
      (_.reduceLeft(And(_, _): Pred))
    case "$or" => ":" ~> ("[" ~> rep1sep(query, ",") <~ "]") ^^
      (_.reduceLeft(Or(_, _): Pred))
    case f => ":" ~> condition(f)
  }

  /** Top-level object: sibling fields merge with implicit AND, the
    * reference's predicate-map merge (dsl/package.scala:62-69). */
  private def query: Parser[Pred] =
    "{" ~> rep1sep(pair, ",") <~ "}" ^^ (_.reduceLeft(And(_, _): Pred))

  /** Parse or throw [[MqlParseException]]. */
  def parse(mql: String): Pred = parseAll(query, mql) match {
    case Success(p, _) => p
    case f: NoSuccess => throw new MqlParseException(
      s"MQL syntax error: ${f.msg} at ${f.next.pos}")
  }
}
