package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.dsl._
import graft.dsl.Dsl._
import graft.operators.{EventLog, Joins}
import graft.sources.mem.{MemStore, MemWireServer}

/** The README's "Migrating from the reference" snippets, compiled and
  * executed verbatim — if a snippet rots, this suite fails, so the
  * documentation stays honest. Each test's body mirrors one README code
  * block (same identifiers, same literals) plus the minimal fixture and
  * a correctness assertion. */
class ReadmeExamplesSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir, table}
  import spark.implicits._

  test("README: predicate DSL block") {
    val lineitem = table("lineitem")
    // --- snippet ---
    val p = ("l_quantity" $gte 10.0 $lte 15.0) && ("l_returnflag" $ne "N")
    val got = lineitem.where(p.column)
    // --- /snippet ---
    val expect = lineitem.where(
      col("l_quantity").between(10.0, 15.0) && col("l_returnflag") =!= "N")
    assert(got.count() === expect.count() && got.count() > 0)
  }

  test("README: join block") {
    val langs = Seq((0, "Java"), (1, "Scala"), (2, "Groovy"))
      .toDF("index", "title")
    val programmers = Seq(("martin", 1), ("james", 0), ("", 1), ("guido", 9))
      .toDF("name", "lang")
    // --- snippet ---
    val joined = Joins.inner(
      outer = langs, outerKey = "index",
      inner = programmers, innerKey = "lang",
      innerPred = Some("name" $ne ""))
      .select(col("index"), col("lang"), col("name"))
    // --- /snippet ---
    val got = joined.collect().map(r => (r.getInt(0), r.getString(2))).sorted.toSeq
    assert(got === Seq((0, "james"), (1, "martin")))
  }

  test("README: event log block") {
    val events = table("events")
    // --- snippet ---
    val log = EventLog.from(events, keyCol = "user_id", key = lit(12L),
      seqCol = "event_id", offset = 100L, maxPartitionSize = 5000L)
    // --- /snippet ---
    val rows = log.select("user_id", "event_id", "partition_nr").collect()
    assert(rows.forall(r => r.getLong(0) == 12L && r.getLong(1) >= 100L))
    assert(rows.forall(r => r.getLong(2) == r.getLong(1) / 5000L))
    val seqs = rows.map(_.getLong(1)).toSeq
    assert(seqs === seqs.sorted && seqs.nonEmpty)
  }

  test("README: MQL channel block") {
    // --- snippet ---
    val df = graft.channel.Channel.create(spark, sfDir) { b =>
      b.collection("lineitem")
      b.q("""{ "$and": [ {"l_quantity": {"$gte": 30}},
                         {"l_returnflag": {"$in": ["A","R"]}} ] }""")
      b.sort("l_orderkey" -> graft.dsl.Order.Ascending); b.limit(20)
    }
    // --- /snippet ---
    val rows = df.collect()
    assert(rows.length === 20)
    val li = table("lineitem")
    assert(li.where(col("l_quantity") >= 30 &&
      col("l_returnflag").isin("A", "R")).count() >= 20)
  }

  test("README: wire client block") {
    MemStore.register("langs_wire",
      Seq((0, "Java", 30), (1, "Scala", 90), (2, "Groovy", 10))
        .toDF("index", "name", "popularity_factor"))
    val server = MemWireServer.start()
    val port = server.port
    // --- snippet ---
    val remote = spark.read.format("graft.sources.mem.GraftMemSource")
      .option("collection", "langs_wire")
      .option("client", "wire").option("port", port.toString)
      .option("deflate", "true")
      .load()
      .where(col("popularity_factor") >= 30)
    // --- /snippet ---
    val got = remote.collect().map(_.getString(1)).sorted.toSeq
    assert(got === Seq("Java", "Scala"))
    server.close()
  }

  test("README: streaming channel block") {
    MemStore.register("keyed_log",
      ((0 until 12).map(i => ("a", i.toLong)) ++
        (0 until 5).map(i => ("b", i.toLong))).toDF("pkey", "seq"))
    // --- snippet ---
    val stream = graft.channel.Channel.stream(spark, startOffset = 0L,
        keyBy = Some("pkey")) { b =>
      b.memCollection("keyed_log")
      b.q("""{ "seq": {"$gte": 0} }""")
    }
    // --- /snippet ---
    assert(stream.isStreaming)
    val ckpt = java.nio.file.Files.createTempDirectory("readme-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("readme-out").toString
    val q = stream.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() === 17)
    graft.gates.GateSupport.deleteRecursively(java.nio.file.Paths.get(ckpt))
    graft.gates.GateSupport.deleteRecursively(java.nio.file.Paths.get(out))
  }
}
