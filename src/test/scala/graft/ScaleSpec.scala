package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Scale-posture proofs on small data: the *plans* that matter at 100 TB.
  * Bucketing removes the shuffle from a co-located join; salting spreads a
  * hot key without changing the join result. */
class ScaleSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table}

  test("bucketed co-located join plans with NO shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val orders = table("orders")
    val lineitem = table("lineitem")
    orders.write.mode("overwrite")
      .option("path", s"$wh/orders_b").bucketBy(8, "o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .option("path", s"$wh/lineitem_b").bucketBy(8, "l_orderkey")
      .saveAsTable("lineitem_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val j = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      assert(j.count() === orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("salted join: same result multiset as the plain join") {
    val orders = table("orders")
    val lineitem = table("lineitem")
    val salted = Joins.saltedInner(lineitem, "l_orderkey", orders, "o_orderkey", salts = 4)
    val plain = lineitem.join(orders,
      lineitem("l_orderkey") === orders("o_orderkey"))
    assert(salted.count() === plain.count())
    // spot-check a grouped projection matches exactly
    val a = salted.groupBy("o_orderkey").count()
    val b = plain.groupBy("o_orderkey").count()
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }
}
