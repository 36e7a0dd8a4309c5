package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dsl._
import graft.dsl.Dsl._
import graft.operators.{EventLog, Joins}

class JoinsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table}

  lazy val orders = table("orders")
  lazy val lineitem = table("lineitem")
  lazy val nation = table("nation")
  lazy val region = table("region")

  test("J1 inner join cardinality matches SQL semantics (reference cardinality oracle style)") {
    val joined = Joins.inner(orders, "o_orderkey", lineitem, "l_orderkey")
    orders.createOrReplaceTempView("o")
    lineitem.createOrReplaceTempView("l")
    val expected = spark.sql("SELECT count(*) FROM o JOIN l ON o_orderkey = l_orderkey")
      .head().getLong(0)
    assert(joined.count() === expected && expected > 0)
  }

  test("J1 with inner predicate == filter-then-join") {
    val j = Joins.inner(orders, "o_orderkey", lineitem, "l_orderkey",
      innerPred = Some("l_quantity" $gt 25.0))
    val expected = orders.join(
      lineitem.where(col("l_quantity") > 25.0),
      orders("o_orderkey") === lineitem("l_orderkey")).count()
    assert(j.count() === expected)
  }

  test("J2 zipByOrdinal stops at the shorter side and pairs in order") {
    val z = Joins.zipByOrdinal(
      nation, Seq(col("n_nationkey").asc),
      region, Seq(col("r_regionkey").asc))
    assert(z.count() === math.min(nation.count(), region.count()))
    val first = z.orderBy(col("n_nationkey")).select("n_nationkey", "r_regionkey").head()
    assert(first.getInt(0) === 0 && first.getInt(1) === 0)
  }

  test("zipWithOrdinal assigns a dense 0-based ordinal") {
    val z = Joins.zipWithOrdinal(nation)
    assert(z.count() === nation.count())
    val ords = z.select("zip_ord").collect().map(_.getLong(0)).sorted
    assert(ords.toSeq === (0L until nation.count()).toSeq)
  }

  test("U1 either is a tagged union with both sides intact") {
    val e = Joins.either(nation, region)
    assert(e.count() === nation.count() + region.count())
    assert(e.where(col("side") === "left").count() === nation.count())
    assert(e.where(col("side") === "right" && col("right").isNotNull).count() === region.count())
  }

  test("U2 concat preserves all rows") {
    val c = Joins.concat(region, region)
    assert(c.count() === 2 * region.count())
  }

  test("S3 event log: offset resume row count (reference domainSize - offset oracle)") {
    val events = table("events")
    val key = events.select("user_id").head().getLong(0)
    val all = events.where(col("user_id") === key)
    val minSeq = all.agg(min("event_id")).head().getLong(0)
    val offset = minSeq + 3
    val log = EventLog.from(events, "user_id", lit(key), "event_id", offset, 256L)
    assert(log.count() === all.where(col("event_id") >= offset).count())
    // partition arithmetic: partition_nr = floor(event_id / 256)
    assert(log.where(col("partition_nr") =!= floor(col("event_id") / 256L)).count() === 0)
  }
}
