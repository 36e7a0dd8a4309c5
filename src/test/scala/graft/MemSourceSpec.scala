package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dsl.Dsl._
import graft.operators.Joins
import graft.sources.mem.MemStore

/** DSv2 connector spec — replicates the reference's embedded-store test
  * setup (mongo-java-server fixtures, SURVEY.md §5): langs (5 dims) ×
  * programmers (100 facts, random FK) with the exact cardinality oracle of
  * JoinMongoSpec.scala:75, plus proof that filters and projection reach the
  * store (the reference's pushdown contract). */
class MemSourceSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val fmt = "graft.sources.mem.GraftMemSource"

  def seed(): Unit = {
    import spark.implicits._
    val langs = Seq(
      (0, "Java", 30), (1, "C++", 20), (2, "ObjectiveC", 10),
      (3, "Scala", 90), (4, "Groovy", 50))
      .toDF("index", "name", "popularity_factor")
    val rnd = new scala.util.Random(42)
    val programmers = (1 to 100)
      .map(i => (s"dev_$i", rnd.nextInt(5)))
      .toDF("name", "lang")
    MemStore.register("langs", langs)
    MemStore.register("programmers", programmers)
  }
  seed()

  def load(c: String) = spark.read.format(fmt).option("collection", c).load()

  test("scan reads all documents") {
    assert(load("langs").count() === 5)
    assert(load("programmers").count() === 100)
  }

  test("J1 on the connector: langs ⋈ programmers == 100 rows (reference JoinMongoSpec oracle)") {
    val langs = load("langs")
    val programmers = load("programmers")
    // mapper projection (P16): programmer name + language name, like the
    // reference's mapper(outer, inner)
    val joined = Joins.inner(langs, "index", programmers, "lang")
      .select(programmers("name").as("programmer"), langs("name").as("language"))
    assert(joined.count() === 100)
  }

  test("filters are pushed to the store (reference pushdown contract)") {
    MemStore.lastPushed.remove("langs")
    val got = load("langs").where(("index" $gte 2 $lte 3).column)
      .select("name").collect().map(_.getString(0)).toSet
    assert(got === Set("ObjectiveC", "Scala"))
    val pushed = MemStore.lastPushed.getOrElse("langs", Nil).map(_.toString).mkString(" ")
    assert(pushed.contains("GreaterThanOrEqual") && pushed.contains("LessThanOrEqual"),
      s"expected range filters pushed, got: $pushed")
  }

  test("projection is pruned at the store (column pruning)") {
    val df = load("programmers").select("lang")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(df.columns.toSeq === Seq("lang"))
    assert(df.distinct().count() === 5)
    // the scan itself reads only the pruned schema
    assert(scanDesc.contains("graft-mem:programmers"))
    assert(!scanDesc.contains("name"), s"scan should not read 'name':\n${scanDesc.take(800)}")
  }

  test("unsupported filters stay Spark-side (residual Filter node)") {
    MemStore.lastPushed.remove("programmers")
    // string EndsWith is not in the store's supported set
    val n = load("programmers").where(col("name").endsWith("_7")).count()
    assert(n === 1)
    val pushed = MemStore.lastPushed.getOrElse("programmers", Nil).map(_.toString)
    assert(!pushed.exists(_.contains("EndsWith")), s"EndsWith must not be pushed: $pushed")
  }

  test("T4 error injection: cursor-creation failure surfaces as query failure (reference MongoObsCursorError)") {
    import spark.implicits._
    MemStore.register("failing_cursor", Seq((1, "a")).toDF("id", "v"))
    MemStore.failureModes("failing_cursor") = MemStore.CursorError
    try {
      val e = intercept[org.apache.spark.SparkException] {
        load("failing_cursor").collect()
      }
      assert(e.getMessage.contains("injected") ||
        Option(e.getCause).exists(_.getMessage.contains("injected")))
    } finally MemStore.failureModes.remove("failing_cursor")
  }

  test("T4 error injection: mid-fetch failure surfaces, never silent truncation (reference MongoObsFetchError)") {
    import spark.implicits._
    MemStore.register("failing_fetch", (1 to 50).map(i => (i, s"v$i")).toDF("id", "v"))
    MemStore.failureModes("failing_fetch") = MemStore.FetchError(afterRows = 3)
    try {
      val e = intercept[org.apache.spark.SparkException] {
        load("failing_fetch").collect()
      }
      assert(e.getMessage.contains("injected") ||
        Option(e.getCause).exists(_.getMessage.contains("injected")))
    } finally MemStore.failureModes.remove("failing_fetch")
  }

  test("O4 maxTimeMS: observed store-side; exceeded deadline fails the query, never truncates") {
    MemStore.lastOptions.remove("programmers")
    // generous deadline: completes, option reaches the store
    assert(spark.read.format(fmt).option("collection", "programmers")
      .option("maxTimeMS", "60000").load().count() === 100)
    assert(MemStore.lastOptions.getOrElse("programmers", Map.empty)
      .get("maxTimeMS").contains("60000"))
    // maxTimeMS=0 means UNBOUNDED (MongoDB cursor semantics) — must
    // complete, and the option still reaches the store
    MemStore.lastOptions.remove("programmers")
    assert(spark.read.format(fmt).option("collection", "programmers")
      .option("maxTimeMS", "0").load().count() === 100)
    // the scan DID record options store-side, and 0 was interpreted as
    // "no deadline" — no maxTimeMS entry, rather than a 0ms one
    val opts0 = MemStore.lastOptions.getOrElse("programmers", Map.empty)
    assert(opts0.get("readPreference").contains("primary"))
    assert(!opts0.contains("maxTimeMS"))
    // tiny positive deadline + injected per-fetch latency: the first
    // fetch alone exceeds it deterministically → query error, not a
    // truncated result
    MemStore.failureModes("programmers") = MemStore.SlowFetch(50)
    try {
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format(fmt).option("collection", "programmers")
          .option("maxTimeMS", "5").load().collect()
      }
      assert(e.getMessage.contains("maxTimeMS") ||
        Option(e.getCause).exists(_.getMessage.contains("maxTimeMS")))
    } finally MemStore.failureModes.remove("programmers")
  }

  test("T7 readPreference: recorded store-side like a driver would route it") {
    MemStore.lastOptions.remove("langs")
    assert(spark.read.format(fmt).option("collection", "langs")
      .option("readPreference", "secondaryPreferred").load().count() === 5)
    assert(MemStore.lastOptions.getOrElse("langs", Map.empty)
      .get("readPreference").contains("secondaryPreferred"))
    // default when unspecified: primary
    assert(load("langs").count() === 5)
    assert(MemStore.lastOptions.getOrElse("langs", Map.empty)
      .get("readPreference").contains("primary"))
  }

  test("unknown collection fails fast") {
    assertThrows[IllegalArgumentException] {
      spark.read.format(fmt).option("collection", "nope").load()
    }
  }
}
