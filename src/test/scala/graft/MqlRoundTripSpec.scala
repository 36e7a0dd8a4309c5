package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.dsl._
import graft.mql.MqlParser

/** MQL text round-trip property: a random predicate tree rendered to MQL
  * JSON and parsed back must partition `lineitem` exactly like the direct
  * DSL compilation — the parser and the renderer-equivalent grammar stay
  * in lockstep or a row-set diff appears. Raw scalacheck with
  * few-but-dense cases (each case runs Spark jobs; the DslPropertySpec
  * discipline). */
class MqlRoundTripSpec extends AnyFunSuite {
  import SparkTestSession.table

  lazy val li = table("lineitem")
    .select("l_quantity", "l_returnflag", "l_linenumber").cache()

  // leaf generators over real columns: numeric comparisons on l_quantity
  // (1..50), $in/$nin on l_returnflag, equality on l_linenumber
  private val numLeaf: Gen[(Pred, String)] = for {
    v <- Gen.chooseNum(1, 50)
    (p, s) <- Gen.oneOf[(Pred, String)](
      (Gt("l_quantity", lit(v)), s"""{ "l_quantity": { "$$gt": $v } }"""),
      (Gte("l_quantity", lit(v)), s"""{ "l_quantity": { "$$gte": $v } }"""),
      (Lt("l_quantity", lit(v)), s"""{ "l_quantity": { "$$lt": $v } }"""),
      (Lte("l_quantity", lit(v)), s"""{ "l_quantity": { "$$lte": $v } }"""),
      (Ne("l_quantity", lit(v)), s"""{ "l_quantity": { "$$ne": $v } }"""))
  } yield (p, s)

  private val flagLeaf: Gen[(Pred, String)] = for {
    flags <- Gen.someOf(Seq("A", "N", "R")).map(_.toSeq).suchThat(_.nonEmpty)
    neg <- Gen.oneOf(true, false)
  } yield {
    val arr = flags.map(f => s""""$f"""").mkString("[", ", ", "]")
    if (neg) (Nin("l_returnflag", flags.map(lit)),
      s"""{ "l_returnflag": { "$$nin": $arr } }""")
    else (In("l_returnflag", flags.map(lit)),
      s"""{ "l_returnflag": { "$$in": $arr } }""")
  }

  private val leaf: Gen[(Pred, String)] = Gen.oneOf(numLeaf, flagLeaf)

  private def tree(depth: Int): Gen[(Pred, String)] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for { (l, ls) <- tree(depth - 1); (r, rs) <- tree(depth - 1) }
        yield (And(l, r): Pred, s"""{ "$$and": [ $ls, $rs ] }""")),
      2 -> (for { (l, ls) <- tree(depth - 1); (r, rs) <- tree(depth - 1) }
        yield (Or(l, r): Pred, s"""{ "$$or": [ $ls, $rs ] }""")),
      1 -> tree(depth - 1).map { case (p, s) =>
        // $not composes over a single field condition object in MQL; wrap
        // a leaf only (the parser's grammar, like Mongo's)
        (p, s)
      })

  test("property: MQL text round-trips to the DSL predicate's row set") {
    val prop = Prop.forAll(tree(2)) { case (pred, mql) =>
      val direct = li.where(pred.column).count()
      val parsed = li.where(MqlParser.parse(mql).column).count()
      direct == parsed
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, s"round-trip failed: ${res.status}")
  }

  test("property: $not over a leaf is the three-valued complement") {
    val prop = Prop.forAll(numLeaf) { case (pred, mql) =>
      val inner = mql.trim.stripPrefix("{").stripSuffix("}").trim
      val notMql = s"""{ "l_quantity": { "$$not": ${inner.split(":", 2)(1).trim} } }"""
      val parsed = li.where(MqlParser.parse(notMql).column).count()
      val direct = li.where(Not(pred).column).count()
      parsed == direct
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"$$not round-trip failed: ${res.status}")
  }
}
