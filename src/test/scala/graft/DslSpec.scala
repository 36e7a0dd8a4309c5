package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dsl._
import graft.dsl.Dsl._

class DslSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table}

  lazy val li = table("lineitem").cache()

  test("chained range == BETWEEN (reference map-merge implicit AND)") {
    val chained = li.where(("l_quantity" $gte 10.0 $lte 15.0).column).count()
    val direct = li.where(col("l_quantity").between(10.0, 15.0)).count()
    assert(chained === direct && chained > 0)
  }

  test("$in / $nin partition the rows") {
    val vals = Seq("A", "R")
    val inN = li.where(("l_returnflag" $in vals).column).count()
    val ninN = li.where(("l_returnflag" $nin vals).column).count()
    assert(inN + ninN === li.count())
  }

  test("&& / || / ! compose like Column boolean algebra") {
    val p = ("l_quantity" $lt 5.0) || (("l_returnflag" $eq "N") && ("l_linestatus" $ne "F"))
    val expected = li.where(
      col("l_quantity") < 5.0 || (col("l_returnflag") === "N" && col("l_linestatus") =!= "F")).count()
    assert(li.where(p.column).count() === expected)
    assert(li.where((!p).column).count() === li.count() - expected)
  }

  test("Q sort/skip/limit slices deterministically") {
    val q = Q()
      .sort("l_orderkey" -> Order.Ascending, "l_linenumber" -> Order.Ascending)
      .skip(10).limit(5)
      .select("l_orderkey", "l_linenumber")
    val got = q(li).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val all = li.orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === all.slice(10, 15))
  }

  test("$all on an array column") {
    import spark.implicits._
    val df = Seq((1, Seq(1, 2, 3)), (2, Seq(2, 3)), (3, Seq(1, 3))).toDF("id", "xs")
    val got = df.where(("xs" $all Seq(1, 3)).column).select("id")
      .collect().map(_.getInt(0)).toSet
    assert(got === Set(1, 3))
  }

  test("RawSql predicate parses through Catalyst") {
    val n = li.where(RawSql("l_quantity >= 10 AND l_quantity <= 15").column).count()
    assert(n === li.where(col("l_quantity").between(10.0, 15.0)).count())
  }
}
