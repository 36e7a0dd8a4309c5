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
    // full reference surface (mongo/package.scala:24-54): tagged preference
    // is validated, normalized, and decomposed into routing metadata
    MemStore.lastOptions.remove("langs")
    assert(spark.read.format(fmt).option("collection", "langs")
      .option("readPreference", "secondaryPreferred[dc=east,rack=r1;dc=west]")
      .load().count() === 5)
    val tagged = MemStore.lastOptions.getOrElse("langs", Map.empty)
    assert(tagged.get("readPreference")
      .contains("secondaryPreferred[dc=east,rack=r1;dc=west]"))
    assert(tagged.get("readPreferenceMode").contains("secondary"))
    assert(tagged.get("readPreferencePreferred").contains("true"))
    assert(tagged.get("readPreferenceTags").contains("dc=east,rack=r1;dc=west"))
    // invalid mode / the reference's rejected combination fail before any
    // job runs (IllegalArgumentException at scan build)
    assertThrows[IllegalArgumentException] {
      spark.read.format(fmt).option("collection", "langs")
        .option("readPreference", "bogus").load().collect()
    }
    assertThrows[IllegalArgumentException] {
      spark.read.format(fmt).option("collection", "langs")
        .option("readPreference", "primary[dc=east]").load().collect()
    }
  }

  test("unknown collection fails fast") {
    assertThrows[IllegalArgumentException] {
      spark.read.format(fmt).option("collection", "nope").load()
    }
  }

  test("$or / $not evaluate store-side (reference mongo/package.scala:109-115)") {
    MemStore.lastPushed.remove("programmers")
    val n = load("programmers")
      .where(col("lang") === 1 || col("lang") === 3).count()
    val pushed = MemStore.lastPushed.getOrElse("programmers", Nil).map(_.toString)
    assert(pushed.exists(_.startsWith("Or(")), s"expected Or pushed, got: $pushed")
    // correctness vs the registered data itself
    val expected = MemStore.rowsOf("programmers")
      .count(r => r.getInt(1) == 1 || r.getInt(1) == 3)
    assert(n === expected)
    // Not: a store-side negation, not a client-side residual
    MemStore.lastPushed.remove("programmers")
    val m = load("programmers").where(!(col("lang") === 2)).count()
    val pushed2 = MemStore.lastPushed.getOrElse("programmers", Nil).map(_.toString)
    assert(pushed2.exists(p => p.contains("Not(") || p.contains("!=")),
      s"expected a negation pushed, got: $pushed2")
    assert(m === MemStore.rowsOf("programmers").count(_.getInt(1) != 2))
  }

  test("limit pushdown: the store serves at most limit rows per cursor (reference storage.scala:320-324)") {
    MemStore.lastLimit.remove("programmers")
    val got = load("programmers").limit(7).collect()
    assert(got.length === 7)
    assert(MemStore.lastLimit.get("programmers").contains(7),
      s"limit not pushed: ${MemStore.lastLimit.get("programmers")}")
    // 4 store partitions × ≤7 rows each — far below the 100-row collection
    val served = MemStore.served.get("programmers").map(_.get()).getOrElse(-1L)
    assert(served > 0 && served <= 28, s"store served $served rows under limit 7")
  }

  test("top-n pushdown: cursor-side sort + limit, exact global result") {
    MemStore.lastTopN.remove("programmers")
    val got = load("programmers").orderBy(col("name").desc).limit(5)
      .collect().map(_.getString(0)).toSeq
    val expected = MemStore.rowsOf("programmers").map(_.getString(0))
      .sorted(Ordering[String].reverse).take(5).toSeq
    assert(got === expected)
    val (keys, n) = MemStore.lastTopN.getOrElse("programmers", (Nil, 0))
    assert(keys === Seq(("name", true)) && n === 5,
      s"topN not pushed: keys=$keys n=$n")
    val served = MemStore.served.get("programmers").map(_.get()).getOrElse(-1L)
    assert(served > 0 && served <= 20, s"store served $served rows under topN 5")
  }

  test("top-n pushdown declines computed sort keys; result stays exact") {
    MemStore.lastTopN.remove("programmers")
    val got = load("programmers").orderBy((col("lang") + 1).desc, col("name"))
      .limit(3).collect().map(_.getString(0)).toSeq
    val expected = MemStore.rowsOf("programmers")
      .map(r => (r.getInt(1), r.getString(0)))
      .sortBy { case (l, nm) => (-l, nm) }.take(3).map(_._2).toSeq
    assert(got === expected)
    assert(!MemStore.lastTopN.contains("programmers"),
      "computed sort key must not be pushed")
  }

  test("offset (skip) pushdown: one global cursor, exact paging with sort+limit") {
    // plain skip: the store applies it exactly (no partial-push contract
    // for offset), so the scan collapses to one cursor partition
    MemStore.lastOffset.remove("programmers")
    val skipped = load("programmers").offset(90)
    assert(skipped.count() === 10)
    assert(MemStore.lastOffset.get("programmers").contains(90),
      s"offset not pushed: ${MemStore.lastOffset.get("programmers")}")
    assert(skipped.rdd.getNumPartitions === 1,
      "a pushed offset requires the single-cursor plan")
    // the reference's full cursor triple sort+skip+limit as one page:
    // the SORT and LIMIT reach the cursor (pushed topN); the skip stays
    // Spark-side here BY DESIGN — DSv2 only pushes an offset past a
    // FULLY-pushed sort (no partial-push contract for offset), and our
    // topN is partially pushed so each shard cursor can prune in
    // parallel. Result is exact either way.
    MemStore.lastOffset.remove("programmers")
    MemStore.lastTopN.remove("programmers")
    val page = load("programmers").orderBy(col("name")).offset(3).limit(5)
      .collect().map(_.getString(0)).toSeq
    val expected = MemStore.rowsOf("programmers").map(_.getString(0))
      .sorted.slice(3, 8).toSeq
    assert(page === expected)
    val (keys, _) = MemStore.lastTopN.getOrElse("programmers", (Nil, 0))
    assert(keys === Seq(("name", false)), s"paging sort must reach the cursor: $keys")
  }

  test("store-reported statistics let Spark broadcast a connector dimension") {
    import spark.implicits._
    MemStore.register("stats_dim", (0 until 20).map(i => (i, s"d$i")).toDF("dk", "dv"))
    val fact = spark.range(0L, 20000L).select((col("id") % 20).cast("int").as("fk"))
    val joined = fact.join(load("stats_dim"), col("fk") === col("dk"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"20-row store relation with reported stats must broadcast:\n${plan.take(1200)}")
    assert(joined.count() === 20000L)
  }

  test("O5 declared clustering order elides the per-partition sort") {
    import spark.implicits._
    val sorted = (0 until 100).map(i => (f"k$i%03d", i)).toDF("name", "v")
    MemStore.register("clustered", sorted)
    val ordered = spark.read.format(fmt).option("collection", "clustered")
      .option("orderedBy", "name").load()
      .sortWithinPartitions("name")
    val planOrdered = ordered.queryExecution.executedPlan.toString
    assert(!planOrdered.contains("Sort "),
      s"declared clustering order must elide the sort:\n${planOrdered.take(1200)}")
    // rows really are served in order within each cursor
    assert(ordered.collect().map(_.getString(0)).toSeq.sliding(2).forall {
      case Seq(a, b) => a <= b; case _ => true })
    // without the declaration the sort stays
    val undeclared = load("clustered").sortWithinPartitions("name")
    assert(undeclared.queryExecution.executedPlan.toString.contains("Sort "),
      "undeclared order must keep the sort")
  }

  test("runtime (DPP-style) filtering reaches the store at execution") {
    import spark.implicits._
    MemStore.register("rt_fact",
      (0 until 1000).map(i => (i % 50, s"p$i")).toDF("k", "payload"))
    MemStore.register("rt_dim",
      (0 until 50).map(i => (i, s"b${i % 10}")).toDF("dk", "bucket"))
    MemStore.lastPushed.remove("rt_fact")
    // selective dim filter + equi-join: Spark injects the dim's keys into
    // the fact scan at execution (SupportsRuntimeFiltering). The dim
    // predicate must NOT be store-pushable (endsWith is outside
    // MemStore.supported): a fully absorbed filter leaves no Filter node
    // for the DPP rule's selectivity check — same reason file-source DPP
    // keys off post-scan dim filters.
    val n = load("rt_fact")
      .join(load("rt_dim").where(col("bucket").endsWith("3")),
        col("k") === col("dk"))
      .count()
    assert(n === 100, s"5 dim keys x 20 fact rows each, got $n")
    val pushed = MemStore.lastPushed.getOrElse("rt_fact", Nil).map(_.toString)
    assert(pushed.exists(f => f.startsWith("In(") || f.contains("k")),
      s"expected a runtime key filter store-side, got: $pushed")
  }

  test("aggregate pushdown: partial group-by served cursor-side, exact merge") {
    MemStore.lastAgg.remove("programmers")
    val raw = MemStore.rowsOf("programmers").map(r => (r.getInt(1), r.getString(0)))
    val expected = raw.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.length.toLong, vs.map(_._2).max) }
    val gotTriples = load("programmers").groupBy("lang")
      .agg(count(lit(1)).as("n"), max(col("name")).as("mx"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(gotTriples === expected)
    val (g, fs) = MemStore.lastAgg.getOrElse("programmers", (Nil, Nil))
    assert(g === Seq("lang") && fs.exists(_.startsWith("count")) &&
      fs.exists(_.startsWith("max")), s"agg not pushed: groups=$g funcs=$fs")
    // the store shipped partials (≤ 4 slices × 5 langs), not 100 rows
    val served = MemStore.served.get("programmers").map(_.get()).getOrElse(-1L)
    assert(served > 0 && served <= 20, s"store served $served partial rows")
  }

  test("aggregate pushdown: global aggregates, empty-store count is 0 not NULL") {
    import spark.implicits._
    MemStore.lastAgg.remove("programmers")
    val row = load("programmers")
      .agg(count(lit(1)).as("n"), sum(col("lang")).as("s"), min(col("name")).as("mn"))
      .head()
    val raw = MemStore.rowsOf("programmers")
    assert(row.getLong(0) === raw.length.toLong)
    assert(row.getLong(1) === raw.map(_.getInt(1).toLong).sum)
    assert(row.getString(2) === raw.map(_.getString(0)).min)
    assert(MemStore.lastAgg.contains("programmers"))
    // empty store: a pushed global count must still be 0 (each cursor
    // ships one partial row even when its slice is empty)
    MemStore.register("agg_empty", Seq.empty[(Int, String)].toDF("id", "v"))
    val e = spark.read.format(fmt).option("collection", "agg_empty").load()
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn")).head()
    assert(e.getLong(0) === 0L && e.isNullAt(1))
    // DISTINCT declines pushdown but stays exact via the row path
    MemStore.lastAgg.remove("programmers")
    val d = load("programmers").agg(countDistinct(col("lang"))).head().getLong(0)
    assert(d === 5L)
    assert(!MemStore.lastAgg.contains("programmers"),
      "distinct aggregates must not push")
  }

  test("table-sample pushdown: the cursor ships only the sampled fraction") {
    import spark.implicits._
    MemStore.register("sample_big",
      (0 until 2000).map(i => (i, s"row$i")).toDF("id", "v"))
    MemStore.lastSample.remove("sample_big")
    val rows = spark.read.format(fmt).option("collection", "sample_big").load()
      .sample(withReplacement = false, 0.2, seed = 7L).collect()
    val n = rows.length.toLong
    // Bernoulli(0.2) over 2000 rows: well inside ±5 sigma
    assert(n > 280 && n < 520, s"sampled count $n far from 400")
    val (lo, hi, _) = MemStore.lastSample.getOrElse("sample_big", (-1.0, -1.0, 0L))
    assert(lo === 0.0 && hi === 0.2, s"sample not pushed: ($lo, $hi)")
    // the STORE served only the sampled rows, not 2000
    val served = MemStore.served.get("sample_big").map(_.get()).getOrElse(-1L)
    assert(served === n, s"store served $served, emitted $n")
    // determinism: same seed, same rows
    val again = spark.read.format(fmt).option("collection", "sample_big").load()
      .sample(withReplacement = false, 0.2, seed = 7L).collect()
    assert(again.map(_.getInt(0)).toSeq === rows.map(_.getInt(0)).toSeq)
    // sample COMPOSES with aggregate pushdown: count() over the sample
    // ships per-cursor partial counts (4 rows), not the sampled rows
    val cnt = spark.read.format(fmt).option("collection", "sample_big").load()
      .sample(withReplacement = false, 0.2, seed = 7L).count()
    assert(cnt === n)
    val servedAgg = MemStore.served.get("sample_big").map(_.get()).getOrElse(-1L)
    assert(servedAgg <= 4, s"sampled count should ship partials, served $servedAgg")
    // with-replacement has no cursor analog: declines, result still valid
    MemStore.lastSample.remove("sample_big")
    spark.read.format(fmt).option("collection", "sample_big").load()
      .sample(withReplacement = true, 0.2, seed = 7L).count()
    assert(!MemStore.lastSample.contains("sample_big"))
  }

  test("join pushdown: two collections join INSIDE the store, no Spark join node") {
    import spark.implicits._
    MemStore.register("jp_langs", Seq(
      (0, "Java", 30), (1, "C++", 20), (2, "ObjectiveC", 10),
      (3, "Scala", 90), (4, "Groovy", 50))
      .toDF("index", "lname", "popularity_factor"))
    MemStore.register("jp_devs",
      (1 to 100).map(i => (s"dev_$i", i % 5)).toDF("dname", "lang"))
    val prev = spark.conf.getOption("spark.sql.optimizer.datasourceV2JoinPushdown")
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    try {
      val langs = load("jp_langs").where(col("popularity_factor") >= 20)
      val devs = load("jp_devs")
      val joined = devs.join(langs, col("lang") === col("index"))
        .select(col("dname"), col("lname"))
      val plan = joined.queryExecution.executedPlan.toString
      // client-side recompute from the registered rows
      val keep = MemStore.rowsOf("jp_langs")
        .filter(_.getInt(2) >= 20).map(r => r.getInt(0) -> r.getString(1)).toMap
      val expected = MemStore.rowsOf("jp_devs")
        .flatMap(r => keep.get(r.getInt(1)).map(l => (r.getString(0), l))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === expected && got.nonEmpty)
      // the join disappeared from the Spark plan: ONE scan serves it
      assert(!plan.contains("Join"),
        s"pushed join must leave no Spark join node:\n${plan.take(1200)}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", v)
        case None => spark.conf.unset("spark.sql.optimizer.datasourceV2JoinPushdown")
      }
    }
  }

  test("S3/S4 streaming offset resume over the store: startOffset honored, restart exactly-once") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val coll = "stream_resume_spec"
    val part1 = (0 until 30).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val part2 = (30 until 45).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    MemStore.register(coll, part1)
    val ckpt = java.nio.file.Files.createTempDirectory("memresume-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("memresume-out").toString
    def incarnation(): Unit = {
      val src = spark.readStream.format(fmt)
        .option("collection", coll).option("startOffset", "10").load()
      val q = src.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    incarnation()
    val first = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
    assert(first.toSeq === (10L until 30L), "startOffset must skip the first 10 rows")
    MemStore.append(coll, part2) // the log grows while the stream is down
    incarnation()
    val all = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
    // exactly-once: appended rows exactly once, no old offsets re-read
    assert(all.toSeq === (10L until 45L))
    graft.gates.GateSupport.deleteRecursively(java.nio.file.Paths.get(ckpt))
    graft.gates.GateSupport.deleteRecursively(java.nio.file.Paths.get(out))
  }

  test("NESTED join pushdown: a 3-collection chain collapses into ONE scan (r12)") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.optimizer.datasourceV2JoinPushdown")
    try {
      spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
      MemStore.register("jp3_region",
        Seq((0, "emea"), (1, "apac")).toDF("rid", "rname"))
      MemStore.register("jp3_team",
        Seq((10, 0, "core"), (11, 1, "infra"), (12, 0, "ml"))
          .toDF("tid", "t_rid", "tname"))
      val rnd = new scala.util.Random(7)
      MemStore.register("jp3_member",
        (1 to 60).map(i => (s"m_$i", 10 + rnd.nextInt(3)))
          .toDF("mname", "m_tid"))
      val joined = load("jp3_member").alias("m")
        .join(load("jp3_team").alias("t"), col("m.m_tid") === col("t.tid"))
        .join(load("jp3_region").alias("r"), col("t.t_rid") === col("r.rid"))
        .select(col("m.mname"), col("t.tname"), col("r.rname"))
      // oracle: recompute client-side from the registered arrays
      val teams = MemStore.rowsOf("jp3_team")
        .map(r => r.getInt(0) -> (r.getInt(1), r.getString(2))).toMap
      val regions = MemStore.rowsOf("jp3_region")
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      val want = MemStore.rowsOf("jp3_member").map { r =>
        val (rid, tname) = teams(r.getInt(1))
        (r.getString(0), tname, regions(rid))
      }.sorted.toSeq
      val got = joined.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted.toSeq
      assert(got === want && got.size === 60)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"),
        s"3-way chain must fully push (no Spark join node):\n${plan.take(1000)}")
      assert(plan.count(_ == '⋈') >= 2,
        s"the scan description should show the nested store tree:\n${plan.take(1000)}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", v)
        case None => spark.conf.unset("spark.sql.optimizer.datasourceV2JoinPushdown")
      }
    }
  }

  test("cross-client join is NOT pushed (a store only joins its own collections)") {
    val prev = spark.conf.getOption("spark.sql.optimizer.datasourceV2JoinPushdown")
    try {
      spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
      val mem = load("langs")
      val pq = spark.read.format(fmt)
        .option("collection", "nation")
        .option("client", "parquet").option("path", SparkTestSession.sfDir)
        .load()
      val j = mem.join(pq, mem("index") === pq("n_regionkey"))
      // result stays correct; the join simply runs Spark-side
      assert(j.count() ===
        spark.read.parquet(s"${SparkTestSession.sfDir}/nation.parquet")
          .where(col("n_regionkey") < 5).count())
      assert(j.queryExecution.executedPlan.toString.contains("Join"),
        "cross-client joins must stay Spark-side")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", v)
        case None => spark.conf.unset("spark.sql.optimizer.datasourceV2JoinPushdown")
      }
    }
  }

  test("keyed streaming offsets: each key resumes at its OWN checkpointed rank (exactly-once)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val coll = "keyed_resume_spec"
    // asymmetric keys — a global row index would resume both keys at the
    // same position and corrupt whichever key is shorter
    val part1 =
      ((0 until 30).map(i => ("log-a", i.toLong)) ++
        (0 until 8).map(i => ("log-b", i.toLong)))
        .sortBy(_._2).toDF("pkey", "seq") // interleaved registration order
    val part2 =
      ((30 until 35).map(i => ("log-a", i.toLong)) ++
        (8 until 20).map(i => ("log-b", i.toLong)))
        .sortBy(_._2).toDF("pkey", "seq")
    MemStore.register(coll, part1)
    val ckpt = java.nio.file.Files.createTempDirectory("memkeyed-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("memkeyed-out").toString
    def incarnation(): Unit = {
      val src = spark.readStream.format(fmt)
        .option("collection", coll)
        .option("keyColumn", "pkey").option("startOffset", "5").load()
      val q = src.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    incarnation()
    val first = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    // startOffset=5 applies PER KEY: each key skips ITS first 5 ranks
    val want1 = ((5 until 30).map(i => ("log-a", i.toLong)) ++
      (5 until 8).map(i => ("log-b", i.toLong))).sorted
    assert(first.toSeq === want1, "per-key startOffset must skip each key's prefix")
    MemStore.append(coll, part2) // both logs grow while the stream is down
    incarnation()
    val all = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    val want2 = ((5 until 35).map(i => ("log-a", i.toLong)) ++
      (5 until 20).map(i => ("log-b", i.toLong))).sorted
    // exactly-once per key: log-a resumes at rank 30, log-b at rank 8 —
    // no re-reads, no skips, despite the asymmetric appends
    assert(all.toSeq === want2)
    graft.gates.GateSupport.deleteRecursively(java.nio.file.Paths.get(ckpt))
    graft.gates.GateSupport.deleteRecursively(java.nio.file.Paths.get(out))
  }

  test("MemKeyedOffset json round-trips keys with quotes, backslashes, control chars") {
    import graft.sources.mem.MemKeyedOffset
    val o = MemKeyedOffset(Map("plain" -> 3L, "qu\"ote" -> 5L,
      "back\\slash" -> 7L, "ctlkey" -> 11L))
    val parsed = MemKeyedOffset.parse(o.json())
    assert(parsed === o)
    assert(MemKeyedOffset.parse(MemKeyedOffset(Map.empty).json()) ===
      MemKeyedOffset(Map.empty))
  }

  test("pushed Not / NOT IN over a NULLABLE column keep SQL three-valued logic (ADVICE r11)") {
    // rows with NULL rating: col =!= v and NOT IN must FILTER them (SQL
    // UNKNOWN), which two-valued store eval got wrong (Not(false) = true)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("rating",
        org.apache.spark.sql.types.IntegerType, nullable = true)))
    val rows = Seq(
      org.apache.spark.sql.Row("a", Int.box(1)),
      org.apache.spark.sql.Row("b", Int.box(2)),
      org.apache.spark.sql.Row("c", null),
      org.apache.spark.sql.Row("d", Int.box(3)),
      org.apache.spark.sql.Row("e", null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), schema)
    MemStore.register("nullable_ratings", df)
    df.createOrReplaceTempView("nullable_ratings_oracle")

    def viaStore(cond: org.apache.spark.sql.Column): Set[String] = {
      MemStore.lastPushed.remove("nullable_ratings")
      load("nullable_ratings").where(cond)
        .select("name").collect().map(_.getString(0)).toSet
    }
    // col =!= v compiles to Not(EqualTo): NULL rows must NOT be served
    assert(viaStore(col("rating") =!= 2) === Set("a", "d"))
    val pushed = MemStore.lastPushed.getOrElse("nullable_ratings", Nil).map(_.toString)
    assert(pushed.exists(p => p.contains("Not(") || p.contains("!=")),
      s"negation should be fully pushed, got: $pushed")
    // NOT IN: UNKNOWN for NULL attribute — only definite non-members pass
    assert(viaStore(!col("rating").isin(1, 3)) === Set("b"))
    // and the positive forms still see exactly the non-null matches
    assert(viaStore(col("rating").isin(1, 3)) === Set("a", "d"))
    assert(viaStore(not(col("rating") < 3)) === Set("d"))
  }

  test("StoreClient seam: parquet-backed client runs the same pushdown pipeline") {
    val dir = SparkTestSession.sfDir
    def viaClient = spark.read.format(fmt)
      .option("collection", "nation")
      .option("client", "parquet").option("path", dir)
      .load()
    // full scan equals the direct parquet read
    val direct = spark.read.parquet(s"$dir/nation.parquet")
    assert(viaClient.count() === direct.count())
    // filters still push (instrumentation is client-independent)
    MemStore.lastPushed.remove("nation")
    val got = viaClient.where(col("n_regionkey") === 0)
      .select("n_name").collect().map(_.getString(0)).toSet
    val want = direct.where(col("n_regionkey") === 0)
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(got === want && got.nonEmpty)
    val pushed = MemStore.lastPushed.getOrElse("nation", Nil).map(_.toString)
    assert(pushed.exists(_.contains("n_regionkey")),
      s"filter must reach the store through the parquet client: $pushed")
    // cursor TopN prunes through the client too
    MemStore.lastTopN.remove("nation")
    val top = viaClient.orderBy(col("n_name")).limit(3)
      .collect().map(_.getString(1)).toSeq
    assert(top === direct.collect().map(_.getString(1)).sorted.take(3).toSeq)
    assert(MemStore.lastTopN.contains("nation"), "TopN should push via the client")
    // unknown client name fails fast
    val e = intercept[Exception] {
      spark.read.format(fmt).option("collection", "nation")
        .option("client", "bogus").load()
    }
    assert(e.getMessage.contains("bogus"))
  }

  test("pushed TopN orders bigints above 2^53 exactly (ADVICE r11)") {
    import spark.implicits._
    // doubles collapse adjacent longs here: (base+1).toDouble == base.toDouble
    val base = (1L << 53) + 2L
    val ids = Seq(base + 1L, base, base + 3L, base - 7L, base + 2L)
    MemStore.register("big_ids",
      ids.zipWithIndex.map { case (v, i) => (v, s"r$i") }.toDF("id", "tag"))
    val got = load("big_ids").orderBy(col("id").desc).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(got === ids.sorted(Ordering[Long].reverse).take(3),
      s"store-side TopN must compare longs exactly, got $got")
    val (keys, n) = MemStore.lastTopN.getOrElse("big_ids", (Nil, 0))
    assert(keys === Seq(("id", true)) && n === 3, "TopN should be pushed")
  }

  test("store eval compares a long column against non-finite doubles (ADVICE r12)") {
    import org.apache.spark.sql.sources.{GreaterThan, LessThan}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // the mixed integral/fractional branch used BigDecimal(a.toString),
    // which throws for "Infinity" — a pushed long-vs-∞ comparison crashed
    // the reader; non-finite doubles now fall back to Double.compare
    val schema = StructType(Seq(StructField("l", LongType)))
    val row = org.apache.spark.sql.Row(Long.box(42L))
    assert(MemStore.eval3(row, schema,
      LessThan("l", Double.box(Double.PositiveInfinity))) === Some(true))
    assert(MemStore.eval3(row, schema,
      GreaterThan("l", Double.box(Double.NegativeInfinity))) === Some(true))
    assert(MemStore.eval3(row, schema,
      GreaterThan("l", Double.box(Double.PositiveInfinity))) === Some(false))
    // and the finite mixed path stays exact above 2^53
    assert(MemStore.eval3(row, schema,
      LessThan("l", Double.box(41.5))) === Some(false))
  }
}
