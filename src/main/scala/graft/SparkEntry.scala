package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dsl._
import graft.dsl.Dsl._
import graft.functions.{Corpus, Dedup, Multimodal, Similarity, TextAnalysis, TextNormalize}
import graft.operators.{EventLog, Joins}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One `queries` entry per implemented operator from SURVEY.md §2 (plus the
  * LLM-pipeline extensions); `oracleSql` holds the DuckDB-equivalent SQL for
  * every SQL-expressible entry. Column names are aliased identically on both
  * sides (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Best-effort recursive delete of a gate's temp staging tree (used by
    * the [[exitManagedTempDir]] shutdown hook — `File.deleteOnExit` cannot
    * remove non-empty directories). */
  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach { q => try { Files.deleteIfExists(q); () } catch { case _: Throwable => () } }
      finally walk.close()
    }
  }

  /** Temp staging dir registered for RECURSIVE deletion at JVM exit —
    * `File.deleteOnExit` cannot remove non-empty dirs, and the sink
    * roundtrip gates return a lazy reader over the staged files, so the
    * tree must survive until the session dies. Without this, one bench
    * round (1 warm-up + up to 3 timed passes per query) leaked ~16 staged
    * parquet/PNG trees (ADVICE r8 #4). */
  private def exitManagedTempDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }

  /** Per-(gate, dir) staged-feed cache: s10/s12 stage a deterministic
    * multi-file feed whose mtime order drives the micro-batch order. The
    * content is a pure function of the input dir, so one JVM stages it
    * ONCE and every later execution (bench warm-up + 3 timed passes)
    * re-reads it — the per-pass restage was both the temp leak (ADVICE r8
    * #4) and about half the gate's measured wall-clock. Dirs are
    * exit-managed. */
  private val stageCache = scala.collection.concurrent.TrieMap[String, String]()

  private def stagedFeed(key: String, prefix: String)(build: String => Unit): String =
    stageCache.getOrElseUpdate(key, {
      val st = exitManagedTempDir(prefix).toString
      build(st)
      st
    })

  /** coalesce(1)-write `df` to `stage/name.parquet` with a controlled
    * mtime (file order == micro-batch order under maxFilesPerTrigger=1). */
  private def writeStaged(stage: String, df: DataFrame, name: String, mtime: Long): Unit = {
    val tmpDir = s"$stage/_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmpDir)
    val part = new java.io.File(tmpDir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file under $tmpDir"))
    val dest = new java.io.File(s"$stage/$name.parquet")
    java.nio.file.Files.move(part.toPath, dest.toPath)
    require(dest.setLastModified(mtime), s"cannot set mtime on $dest")
  }

  /** PNG staging for `src_binaryfile_media`, built ONCE per JVM and reused
    * by every execution of the gate (the content is a pure function of the
    * id range — the per-execution restage was the leak). */
  private lazy val binaryFileStage: String = {
    val stage = exitManagedTempDir("graft-binfile")
    (0L until 100L).foreach { id =>
      java.nio.file.Files.write(stage.resolve(s"img_$id.png"),
        graft.functions.Multimodal.grayTestImage(id, "png"))
    }
    stage.toString
  }

  /** Bucketed-warehouse staging for `j_bucketed_join`: both join sides are
    * written ONCE per (JVM, dir) as external BUCKETED tables (8 buckets on
    * the join key, sorted within buckets) under an exit-managed dir. This
    * is the 100 TB join posture in storage form — the shuffle is paid once
    * at write time; every subsequent join on the bucket key reads
    * co-located buckets with NO exchange on either side (plan-asserted in
    * LayoutSpec). Table metadata lives in the shared in-memory catalog, so
    * child sessions of the same JVM see the tables without re-staging. */
  private def bucketedTables(s: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val (oT, lT) = (s"orders_bkt$tag", s"lineitem_bkt$tag")
    stageCache.getOrElseUpdate(s"bucketed#$dir", {
      val wh = exitManagedTempDir("graft-bucketed").toString
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/$oT").saveAsTable(oT)
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/$lT").saveAsTable(lT)
      wh
    })
    (oT, lT)
  }

  /** Three-batch staged feed SHARED by the s12 (left) and s15 (full)
    * stream-stream outer-join gates — identical content, staged once per
    * (JVM, dir) under one cache key:
    *   batch 0 = the real events feed (matches emit as found);
    *   batch 1 = a sentinel click+purchase pair at max(ts)+2h → commits
    *             the watermark to max(ts)+1h, past every feed bound;
    *   batch 2 = a second sentinel pair at max(ts)+3h — its processing
    *             runs eviction under the batch-1 watermark, flushing
    *             every unmatched feed row as a NULL-side outer row.
    * Sentinel spread ≤ 1.5h: even the trailing batch's watermark
    * (max+3h − 1h = max+2h) stays below sentinel-1's join bound
    * (max+2h30m), so no sentinel can ever flush as an unmatched row; the
    * click and purchase sentinels carry DISJOINT user ids (-1 vs -2) so
    * they advance their sides' watermarks without joining each other.
    * Returns (stage path, feed schema). */
  private def outerJoinFeed(ss: SparkSession, dir: String)
      : (String, org.apache.spark.sql.types.StructType) = {
    val ev = t(ss, dir, "events").select(col("event_id"), col("user_id"),
      col("event_type"), Tables.tsFromNanos(col("ts")).as("event_ts"))
    val stage = stagedFeed(s"s12#$dir", "graft-outer") { st =>
      val maxTs = ev.agg(max(col("event_ts"))).head().getTimestamp(0)
      def sentinels(tag: Long, plusHours: Int): DataFrame = {
        import ss.implicits._
        Seq(("click", -tag, -1L), ("purchase", -tag - 1L, -2L))
          .toDF("event_type", "eid", "uid")
          .select(col("eid").as("event_id"), col("uid").as("user_id"),
            col("event_type"),
            (lit(maxTs) + expr(s"INTERVAL $plusHours HOURS")).as("event_ts"))
      }
      val now = System.currentTimeMillis()
      writeStaged(st, ev, "a_feed", now - 180000)
      writeStaged(st, sentinels(1L, 2), "b_s1", now - 120000)
      writeStaged(st, sentinels(3L, 3), "c_s2", now - 60000)
    }
    (stage, ev.schema)
  }

  /** Fold [[Tables.sessionConf]] into a builder — the one place session-level
    * settings the catalog needs (nanos-as-long parquet reads) are applied. */
  def sessionBuilder(b: SparkSession.Builder): SparkSession.Builder =
    Tables.sessionConf.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Planted-contamination seeding SHARED by `text_decontaminate` and
    * `pipe_training_corpus` (their DuckDB oracles mirror it verbatim —
    * keep all three sites in lockstep): the eval split is the fixed id
    * range doc_id < 40, and a disjoint train slice (doc_id % 10 = 3) gets
    * the same planted sentence so contamination hits exist at every scale
    * factor. */
  private def seededDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") < 40 || col("doc_id") % 10 === 3,
        concat(col("text"),
          lit(" the quick brown fox jumps over the lazy dog tonight")))
        .otherwise(col("text")).as("text"))

  /** Money columns in the testdata are exact 2-decimal values; computing in
    * DECIMAL makes Spark and the DuckDB oracle bit-identical (double
    * accumulation order / round-half ties differ between engines). Final
    * results are cast back to double for a stable schema. */
  private def money(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** Differential invariants of an approximate-NN probe result (round-7
    * verdict #2): per query, the row count, the number of rows whose
    * `rank` matches an independently-recomputed (score desc, id asc)
    * row_number, and the number of scores EXACTLY equal to the cosine
    * recomputed from the raw embeddings table. For a correct probe the
    * scores are bit-equal (identical expression shape on identical
    * inputs), so the oracle is a constant row per query — any drift in
    * candidate generation, scoring, or TopK ordering breaks the hash. */
  private def annInvariants(probe: DataFrame, emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    probe
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .withColumn("exact", try_divide(Similarity.dot(col("qv"), col("cv")),
        Similarity.l2norm(col("qv")) * Similarity.l2norm(col("cv"))))
      .withColumn("expected_rank", row_number().over(w))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).cast("int").as("n_results"),
        sum(when(col("rank") === col("expected_rank"), 1).otherwise(0))
          .cast("int").as("n_rank_ok"),
        sum(when(col("score") === col("exact"), 1).otherwise(0))
          .cast("int").as("n_score_exact"),
        max(abs(col("score") - col("exact"))).as("max_score_err"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The M2 end-to-end slice: DSL-filtered outer ⋈ fact with mapper
    * projection (reference J1, join/package.scala:52-63). */
  def entry(spark: SparkSession): DataFrame = {
    // the driver invokes entry on a session it built itself — apply the
    // session-level settings Tables needs here, at the contract boundary
    // (everywhere else they're set at SparkSession build; Tables.load
    // itself is side-effect-free)
    Tables.sessionConf.foreach { case (k, v) => spark.conf.set(k, v) }
    queries("j1_join_inner")(spark, "/root/testdata/sf0.001")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1 — scan with predicate + projection pushdown (reference
    // storage.scala:315-327; pushdown into find()). Catalyst pushes both
    // into the parquet scan: .explain shows PushedFilters + 3-col ReadSchema.
    "s1_scan_pushdown" -> ((s, dir) => {
      val q = Q()
        .where(("l_quantity" $gte 30.0) && ("l_returnflag" $eq "A"))
        .select("l_orderkey", "l_partkey", "l_quantity")
      q(t(s, dir, "lineitem"))
    }),

    // P1/P2/P7 + O1/O2/O3 — chained range (implicit AND map-merge,
    // reference dsl/package.scala:62-69) + sort/skip/limit pushdown
    // (dsl/package.scala:48-58). Sort keys form a unique key so the
    // skip/limit slice is deterministic.
    "p_dsl_range_sort_page" -> ((s, dir) => {
      val q = Q()
        .where("l_quantity" $gte 10.0 $lte 15.0)
        .sort("l_orderkey" -> Order.Ascending, "l_linenumber" -> Order.Ascending)
        .skip(5)
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      q(t(s, dir, "lineitem"))
    }),

    // P3/P4/P5/P8 — $ne/$in/$nin with and/or connectives
    // (reference mongo/package.scala:87-90,101-120).
    "p_dsl_bool_ops" -> ((s, dir) => {
      val pred =
        (("o_orderstatus" $ne "F") && ("o_orderpriority" $in Seq("1-URGENT", "2-HIGH"))) ||
          (("o_totalprice" $gt 400000.0) && ("o_orderpriority" $nin Seq("5-LOW")))
      Q().where(pred).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")(
        t(s, dir, "orders"))
    }),

    // P6 — `$all` on an array field (reference mongo/package.scala:89, test
    // IntegrationMongoClientSpec.scala:183): every listed value must be
    // contained. Array column derived by tokenizing documents.text — the
    // same shape as the reference's array-valued Mongo fields.
    "p6_all_array" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("words", split(col("text"), " "))
      Q().where("words" $all Seq("scan", "column")).select("doc_id")(docs)
    }),

    // P10 — `fk` parameter binding (reference dsl/package.scala:84,91-92):
    // the outer key bound into the parameterized inner query of a join —
    // here the inner side is pre-restricted by the bound key, exactly the
    // reference's per-outer-row inner query with its `fk` filled in.
    "p10_fk_param" -> ((s, dir) => {
      val orders = Q().where("o_orderkey" $eq 7L)(t(s, dir, "orders"))
      Joins.inner(orders, "o_orderkey", t(s, dir, "lineitem"), "l_orderkey",
          innerPred = Some(fk("l_orderkey", 7L)))
        .select(col("o_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // P15 — the `|>` pipe (reference channel/package.scala:50-55): arbitrary
    // stage application via Dataset.transform, operator spelling restored.
    "p15_pipe" -> ((s, dir) => {
      t(s, dir, "customer") |>
        (df => df.where(col("c_acctbal") > 5000.0)) |>
        (df => df.select(col("c_custkey"), col("c_name"),
          (money(col("c_acctbal")) * money(lit(1.1))).cast("double").as("boosted_bal")))
    }),

    // J1 — the flagship inner join: DSL-filtered outer × keyed inner with a
    // mapper projection (reference join/package.scala:52-63,74-132).
    "j1_join_inner" -> ((s, dir) => {
      val orders = Q().where("o_orderstatus" $eq "O")(t(s, dir, "orders"))
      Joins.inner(orders, "o_orderkey", t(s, dir, "lineitem"), "l_orderkey")
        .select(
          col("o_orderkey"),
          col("o_orderdate").cast("date").as("order_date"),
          col("l_partkey"),
          col("l_quantity"),
          (money(col("l_extendedprice")) * (money(lit(1.0)) - money(col("l_discount"))))
            .cast("double").as("net_price"))
    }),

    // S3/O6/T1 — partitioned event-log scan with offset resume
    // (reference log/package.scala:56-62, storage.scala:329-349).
    "s3_eventlog_offset" -> ((s, dir) => {
      EventLog.from(t(s, dir, "events"), "user_id", lit(7L), "event_id",
          offset = 100L, maxPartitionSize = 256L)
        .select(col("user_id"), col("event_id"), col("partition_nr"),
          col("event_type"), col("value"))
    }),

    // P11/S5 — MQL string query through the channel builder (reference
    // mqlparser/package.scala:67-235 grammar; channel/package.scala:206-263
    // builder): parsed to the Pred algebra, compiled to Catalyst Columns.
    "p11_mql_channel" -> ((s, dir) => {
      graft.channel.Channel.create(s, dir) { b =>
        b.q("""{ "$or": [ { "l_quantity": { "$gte": 45 } },
                          { "l_returnflag": { "$in": ["A"] }, "l_quantity": { "$lt": 5 } } ] }""")
        b.collection("lineitem")
        b.sort("l_orderkey" -> Order.Ascending, "l_linenumber" -> Order.Ascending)
        b.skip(3)
        b.limit(500)
      }.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    }),

    // P11+ — MQL `$not`/`$exists`, BEYOND the reference parser's own TODO
    // (mqlparser/package.scala:98). No table carries nulls, so the gate
    // derives a null-bearing column (NULL lang for doc_id % 7 == 0 — the
    // oracle mirrors the same CASE) and runs one query exercising
    // $exists:false, $exists:true, and $not over a range op, composed
    // under $or. SQL three-valued semantics throughout (Exists scaladoc).
    "p17_mql_not_exists" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("lang_opt",
        when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("lang")))
      val p = graft.mql.MqlParser.parse(
        """{ "$or": [ { "lang_opt": { "$exists": false } },
                      { "lang_opt": { "$exists": true },
                        "n_chars": { "$not": { "$lt": 600 } } } ] }""")
      docs.where(p.column).select("doc_id", "lang_opt", "n_chars")
    }),

    // S5-preferred — full SQL text through Catalyst's parser (SURVEY.md
    // §2.2 P11 verdict: "prefer spark.sql"): the reference's string-query
    // channel upgraded to ANSI SQL.
    "q_sql_direct" -> ((s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier_v")
      t(s, dir, "nation").createOrReplaceTempView("nation_v")
      s.sql("""SELECT n_name, COUNT(*) AS n_suppliers,
                      CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
               FROM supplier_v JOIN nation_v ON s_nationkey = n_nationkey
               GROUP BY n_name""")
    }),

    // §2.7 — correlated EXISTS / NOT EXISTS subqueries: Catalyst
    // DECORRELATES both into joins (semi + anti) — the planner feature a
    // SQL user hits constantly; identical text runs in DuckDB.
    "q_correlated_exists" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders_v o
               WHERE EXISTS (SELECT 1 FROM lineitem_v l
                             WHERE l.l_orderkey = o.o_orderkey
                               AND l.l_quantity >= 49.0)
                 AND NOT EXISTS (SELECT 1 FROM lineitem_v l
                                 WHERE l.l_orderkey = o.o_orderkey
                                   AND l.l_returnflag = 'R')""")
    }),

    // §2.7 — RECURSIVE CTE (new in Spark 4): transitive closure of the
    // planted 3-hop chain graph in PURE SQL — the same fixed-point
    // semantics dedup_cluster_cc implements with pointer-jumping, here
    // delegated to Catalyst's recursion operator. One SQL text serves
    // both engines (only the table name differs).
    "q_recursive_cte" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("docs_v")
      s.sql(recursiveClosureSql("docs_v"))
    }),

    // P9/S2 — raw SQL predicate fragment (reference's raw-CQL select,
    // dsl/package.scala:83-86) parsed by Catalyst.
    "s2_scan_raw" -> ((s, dir) => {
      Q().where(RawSql("event_type IN ('click','view') AND value > 50"))
        .select("event_id", "event_type", "value")(t(s, dir, "events"))
    }),

    // §1.2 dynamic-schema regime — the reference's ragged Mongo documents
    // (fields present on some rows only ⇒ nulls, SURVEY.md §1.2): JSON
    // document column parsed schema-on-read; missing keys become nulls.
    // json_tuple parses the document ONCE for both fields (get_json_object
    // re-parsed per extraction — and the pushed filter re-parsed again:
    // 3 parses/row, the slowest round-1 bench entry); the generator output
    // shares the single parse and the filter sits above the Generate node.
    "p_dynamic_json" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          json_tuple(col("props"), "k", "missing_field").as(Seq("k_raw", "missing_field")))
        .withColumn("k", col("k_raw").cast("int"))
        .where(col("k") > 50)
        .select("event_id", "k", "missing_field")
    }),

    // P12 — single-column typed extraction (reference `column[B]`,
    // channel/package.scala:181-188) via a primitive Encoder.
    "p12_column" -> ((s, dir) => {
      import s.implicits._
      val names: org.apache.spark.sql.Dataset[String] =
        t(s, dir, "part").select("p_name").as[String]
      names.toDF("p_name")
    }),

    // P13/P14 — case-class projection + typed per-record map (reference
    // `as[T]` channel/package.scala:194-203 and `map` :62): by-name Encoder
    // derivation, then a typed transform that round-trips the rows through
    // the object form.
    "p13_as_typed" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").as[graft.model.OrderRow]
        .filter(o => o.o_totalprice > 300000.0)
        .map(o => (o.o_orderkey, o.o_orderstatus, o.o_totalprice))
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    }),

    // J2/J3 — deterministic pairwise zip of two ordered relations, stopping
    // at the shorter side (reference zipWith, channel/package.scala:92-143).
    "j2_zipwith" -> ((s, dir) => {
      Joins.zipByOrdinal(
        t(s, dir, "nation").select("n_nationkey", "n_name"),
        Seq(col("n_nationkey").asc),
        t(s, dir, "region").select("r_regionkey", "r_name"),
        Seq(col("r_regionkey").asc))
    }),

    // J3 — `zip`: pairwise alignment into (left, right) structs (reference
    // channel/package.scala:143), flattened for the oracle compare.
    "j3_zip" -> ((s, dir) => {
      Joins.zip(
          t(s, dir, "nation").select("n_nationkey", "n_name"),
          Seq(col("n_nationkey").asc),
          t(s, dir, "region").select("r_regionkey", "r_name"),
          Seq(col("r_regionkey").asc))
        .select(col("left.n_nationkey").as("n_nationkey"), col("left.n_name").as("n_name"),
          col("right.r_regionkey").as("r_regionkey"), col("right.r_name").as("r_name"))
    }),

    // J4 — `zip` against a size-restricting side (reference zip+limit,
    // channel/package.scala:108): the shorter (limited) side bounds the
    // output length through the min-length inner join on ordinals.
    "j4_zip_limit" -> ((s, dir) => {
      val r3 = t(s, dir, "region").select("r_regionkey", "r_name")
        .orderBy(col("r_regionkey")).limit(3)
      Joins.zip(
          t(s, dir, "nation").select("n_nationkey", "n_name"),
          Seq(col("n_nationkey").asc),
          r3, Seq(col("r_regionkey").asc))
        .select(col("left.n_nationkey").as("n_nationkey"), col("left.n_name").as("n_name"),
          col("right.r_regionkey").as("r_regionkey"), col("right.r_name").as("r_name"))
    }),

    // J5 — `tee`: arbitrary deterministic two-input combinator (reference
    // channel/package.scala:118-119) — here instantiated with a keyed join.
    "j5_tee" -> ((s, dir) => {
      Joins.tee(t(s, dir, "supplier"), t(s, dir, "nation")) { (sup, nat) =>
        sup.join(nat, sup("s_nationkey") === nat("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
      }
    }),

    // J6 — one-to-one log zip: two event-log partitions aligned by ordinal
    // with min-length semantics (reference
    // test/eventlog/PartitionedLogCassandraSpec.scala:116-152, asserting
    // `domainSize - 15` — output length = the shorter log).
    "j6_log_zip" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("click_user"))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("view_user"))
      Joins.zipByOrdinal(clicks, Seq(col("click_id").asc), views, Seq(col("view_id").asc))
    }),

    // S6 — batch sink: write the result to a parquet sink, read it back
    // (the reference's sink surface is the driver; the roundtrip proves
    // schema + data survive the sink, oracle-checked).
    "s6_sink_roundtrip" -> ((s, dir) => {
      val out = exitManagedTempDir("graft_sink").toString
      Joins.inner(t(s, dir, "nation"), "n_regionkey", t(s, dir, "region"), "r_regionkey")
        .select("n_nationkey", "n_name", "r_name")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
    }),

    // U1 — nondeterministic tagged merge (reference `either`,
    // channel/package.scala:129-131), flattened to a comparable shape.
    "u1_either" -> ((s, dir) => {
      val l = t(s, dir, "customer").select(col("c_name").as("name"))
      val r = t(s, dir, "supplier").select(col("s_name").as("name"))
      Joins.either(l, r)
        .select(col("side"), coalesce(col("left.name"), col("right.name")).as("name"))
    }),

    // U2 — ordered source concatenation (reference `++`,
    // test/SportCenterSpec.scala:88).
    "u2_concat" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
      Joins.concat(
        li.where(col("l_quantity") <= 2.0),
        li.where(col("l_quantity") >= 49.0))
    }),

    // §2.8 extension — event-time tumbling window aggregation (batch form).
    // The reference has event_time in the data model but never windows it
    // (SURVEY.md §2.8); Spark supplies window() natively. Sums are exact
    // decimals for the DuckDB compare (time_bucket == window alignment).
    "q_time_window" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("event_ts", Tables.tsFromNanos(col("ts")))
        .groupBy(window(col("event_ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast("double").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
    }),

    // §2.8 extension — SLIDING event-time windows (1 h window, 30 min
    // slide): every event lands in exactly two overlapping windows.
    "q_sliding_window" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("event_ts", Tables.tsFromNanos(col("ts")))
        .groupBy(window(col("event_ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast("double").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
    }),

    // S4/T1-T3 — the SAME window aggregation through Structured Streaming:
    // file source (micro-batch demand ≙ the reference's demand paging,
    // storage.scala:149,172-180), Trigger.AvailableNow for bounded runs
    // (≙ reference stream completion on bounded queries, storage.scala:137).
    // Verified against the identical DuckDB oracle as the batch form.
    "s4_stream_window" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      // State-store count == shuffle partitions at query start; size it to
      // the workload (a bounded micro-batch) in an ISOLATED child session
      // (shared SparkContext, private SQLConf) — mutating the caller's
      // session-global conf would leak to concurrent queries and on
      // failure between set and restore.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = t(ss, dir, "events").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val agg = src
        .withColumn("event_ts", Tables.tsFromNanos(col("ts")))
        .withWatermark("event_ts", "1 hour")
        .groupBy(window(col("event_ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast("double").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
      val sink = "s4_stream_window_sink"
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // S6/J1-streaming — STREAM-STREAM inner join with watermarks and an
    // event-time range condition (the north-star "Structured Streaming
    // joins" form of the reference's streaming inner join): clicks joined
    // to purchases by the same user within 30 minutes. AvailableNow feeds
    // all data in one micro-batch, so watermark state-purge cannot drop
    // matches and the result equals the batch join (the DuckDB oracle).
    "s6_stream_join" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      // Stream-stream join keeps 4 state stores per shuffle partition;
      // size partitions to this bounded feed in an isolated child session
      // (see s4 note — never mutate the shared session conf).
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = t(ss, dir, "events").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .withColumn("event_ts", Tables.tsFromNanos(col("ts")))
      val clicks = src.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("event_ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = src.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("event_ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val joined = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"))
      val sink = "s6_stream_join_sink"
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // §2.8 — stream-stream LEFT OUTER join: the attribution query's hard
    // half ("clicks WITHOUT a conversion") — unmatched left rows must
    // emit with a NULL right side, which only happens once the global
    // watermark provably passes each click's join bound (c_ts + 30 min).
    // A single-batch feed can never flush those rows (no later batch
    // advances the watermark), so the gate stages THREE files with
    // controlled mtimes + maxFilesPerTrigger=1, like s10:
    //   batch 0 = the real feed (matches emit as found);
    //   batch 1 = a sentinel click+purchase pair at max(ts)+2h → commits
    //             the watermark to max(ts)+1h, past every feed bound;
    //   batch 2 = a second sentinel pair at max(ts)+3h — its processing
    //             runs eviction under the batch-1 watermark, flushing
    //             every unmatched feed click as a NULL-purchase row.
    // The sentinels themselves stay in state forever (the watermark never
    // passes THEIR bounds) so they cannot pollute the output; the oracle
    // is the plain batch LEFT JOIN over the real feed.
    "s12_stream_outer_join" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      // 4 state partitions, not the session's 32 (nor the old 8): each of
      // the three micro-batches initializes one state store PER shuffle
      // partition, and store setup dominates this bounded feed's cost —
      // idle min-of-3 measured 3.4s at 8 partitions, 2.5s at 4, with 2
      // within noise of 4. Sizing state-store count to the workload is
      // the same per-gate dial s4 documents.
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val (stage, schema) = outerJoinFeed(ss, dir)
      val src = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val clicks = src.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("event_ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = src.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("event_ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val joined = clicks.join(purchases,
          col("c_user") === col("p_user") &&
            col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
          "left_outer")
        .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"))
      val sink = "s12_stream_outer_join_sink"
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // §2.8 — stream-stream LEFT SEMI join: "clicks that converted" as an
    // existence test — each matched click emits ONCE no matter how many
    // purchases land in its window (the dedup the inner join can't give),
    // and unmatched clicks age out of state silently at the watermark.
    // Same shared sentinel feed (the sentinels' disjoint user ids mean
    // they can never match, so a correct semi join drops them — leak
    // check built into the row set). Oracle = batch EXISTS.
    "s17_stream_semi_join" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      // 4 state partitions, not the session's 32 (nor the old 8): each of
      // the three micro-batches initializes one state store PER shuffle
      // partition, and store setup dominates this bounded feed's cost —
      // idle min-of-3 measured 3.4s at 8 partitions, 2.5s at 4, with 2
      // within noise of 4. Sizing state-store count to the workload is
      // the same per-gate dial s4 documents.
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val (stage, schema) = outerJoinFeed(ss, dir)
      val src = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val clicks = src.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("event_ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = src.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("event_ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val joined = clicks.join(purchases,
          col("c_user") === col("p_user") &&
            col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
          "left_semi")
        .select(col("c_user").as("user_id"), col("click_id"))
      val sink = "s17_stream_semi_join_sink"
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // §2.8 — stream-stream FULL OUTER join: both unmatched directions at
    // once — clicks without a conversion AND purchases without a
    // preceding click each flush as a NULL-other-side row once the global
    // watermark provably passes their join bound. Same three-batch
    // sentinel feed as s12 (shared staging, one cache key); the sentinels
    // themselves stay in state forever on BOTH sides, so they cannot
    // pollute either unmatched direction. Oracle = the plain batch FULL
    // JOIN over the real feed.
    "s15_stream_full_outer" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      // 4 state partitions, not the session's 32 (nor the old 8): each of
      // the three micro-batches initializes one state store PER shuffle
      // partition, and store setup dominates this bounded feed's cost —
      // idle min-of-3 measured 3.4s at 8 partitions, 2.5s at 4, with 2
      // within noise of 4. Sizing state-store count to the workload is
      // the same per-gate dial s4 documents.
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val (stage, schema) = outerJoinFeed(ss, dir)
      val src = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val clicks = src.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("event_ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = src.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("event_ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val joined = clicks.join(purchases,
          col("c_user") === col("p_user") &&
            col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
          "full_outer")
        .select(coalesce(col("c_user"), col("p_user")).as("user_id"),
          col("click_id"), col("purchase_id"))
      val sink = "s15_stream_full_outer_sink"
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // §2.6 sinks — foreachBatch, the PRODUCTION streaming sink API (the
    // escape hatch every real pipeline uses for exactly-once writes to
    // batch-only targets): a three-file staged feed (maxFilesPerTrigger=1
    // → three micro-batches) lands each epoch in its own batch=<id>
    // directory with mode("overwrite") — re-running an epoch overwrites,
    // never duplicates (idempotent-by-path, the documented foreachBatch
    // exactly-once recipe). The union read-back must equal the batch
    // filter+projection — proving no batch lost, duplicated, or leaked
    // across epoch boundaries. Partition-discovery exposes the epoch as a
    // `batch` column; the gate projects it away.
    "s16_stream_foreach_batch" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val ev = t(ss, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val stage = stagedFeed(s"feb#$dir", "graft-feb-src") { st =>
        val now = System.currentTimeMillis()
        (0 to 2).foreach { i =>
          writeStaged(st, ev.where(pmod(col("event_id"), lit(3)) === i),
            s"${('a' + i).toChar}_slice$i", now - (3 - i) * 60000L)
        }
      }
      val out = exitManagedTempDir("graft-feb-out").toString
      val src = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val cleaned = src.where(col("event_type").isin("click", "purchase"))
      val q = cleaned.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$out/batch=$batchId")
        }
        .option("checkpointLocation", s"$out/_ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.read.parquet(out).select("event_id", "user_id", "event_type")
    }),

    // §2.8 — LATE-DATA DROP, actually exercised (round-7 verdict #8): every
    // other watermarked gate feeds AvailableNow over one file, where the
    // watermark can never retire state before data arrives — the drop path
    // was spec-claimed, not driver-verified. This gate stages THREE files
    // with controlled modification times and maxFilesPerTrigger=1.
    // Spark's late-record filter uses the PREVIOUS batch's committed
    // watermark (the SPARK-40925 two-watermark split: lateEvents = prior
    // batch, eviction = current), so a two-batch feed can never drop —
    // the middle batch exists to commit the advanced watermark:
    //   batch 0 = the full feed → watermark commits to max(ts) − 10 min;
    //   batch 1 = replays of rows STRICTLY inside the watermark allowance
    //             (ts > max − 10 min; their windows are still open and
    //             withheld by append mode, so they cannot touch emitted
    //             output) — after it, the late-filter watermark is armed;
    //   batch 2 = replays of the EARLIEST hour — every row is older than
    //             the armed watermark and MUST be dropped before state.
    // If dropping failed, the replayed hour's finalized window would
    // re-emit (duplicate row) and break the row count + hash. Oracle =
    // the batch aggregation WITH THE SAME CUTOFF predicate (append mode
    // emits exactly the windows with window_end ≤ max(ts) − 10 min), and
    // correct late-drop means replays contribute nothing to it.
    "s10_stream_late_drop" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val ev = t(ss, dir, "events").select(
        col("event_id"), col("user_id"), col("event_type"),
        Tables.tsFromNanos(col("ts")).as("event_ts"))
      val stage = stagedFeed(s"s10#$dir", "graft-late") { st =>
        // span endpoints: two column-pruned min/max scans (gate staging,
        // not query work)
        val Array(minTs, maxTs) = ev.agg(min(col("event_ts")), max(col("event_ts")))
          .head().toSeq.map(_.asInstanceOf[java.sql.Timestamp]).toArray
        val lateReplay = ev.where(col("event_ts") < lit(minTs) + expr("INTERVAL 1 HOUR"))
        val freshReplay = ev.where(col("event_ts") > lit(maxTs) - expr("INTERVAL 10 MINUTES"))
        val now = System.currentTimeMillis()
        writeStaged(st, ev, "a_feed", now - 180000)
        writeStaged(st, freshReplay, "b_fresh", now - 120000)
        writeStaged(st, lateReplay, "c_late", now - 60000)
      }
      val src = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1") // one file per micro-batch, in
        // mtime order: A commits the watermark, B arms the late filter,
        // C is provably late
        .parquet(stage)
      val agg = src
        .withWatermark("event_ts", "10 minutes")
        .groupBy(window(col("event_ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      val sink = "s10_stream_late_drop_sink"
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // Streaming dedup — dropDuplicates across micro-batches (the streaming
    // form of exact dedup; state = seen keys, scales with watermark +
    // key-partitioned state stores). AvailableNow feeds all data, so the
    // result equals batch DISTINCT (the DuckDB oracle).
    // Streaming twin of corpus_chunk: chunkTokens is stateless map-only
    // (sequence+slice arithmetic), so the SAME operator code runs
    // unchanged over readStream micro-batches — no state store, no
    // watermark, per-batch parallelism. Oracle = the batch chunking SQL.
    "s11_stream_chunk" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = t(ss, dir, "documents").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val chunks = Corpus.chunkTokens(src, "doc_id", "text",
        chunkSize = 64, overlap = 16)
      val sink = "s11_stream_chunk_sink"
      val q = chunks.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // Streaming UNION — two differently-TRANSFORMED branches of the
    // micro-batch DAG merged into one sink (the multi-feed ingestion
    // shape): clicks pass through, purchases get a derived doubled value,
    // both branches union by name. Stateless ⇒ result equals the batch
    // UNION ALL.
    "s18_stream_union" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = t(ss, dir, "events").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val a = src.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), lit("click").as("kind"),
          col("value"))
      val b = src.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), lit("purchase_2x").as("kind"),
          (money(col("value")) * 2).cast("double").as("value"))
      val sink = "s18_stream_union_sink"
      val q = a.unionByName(b).writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    "s7_stream_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = t(ss, dir, "events").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val dedup = src.select(col("user_id"), col("event_type")).dropDuplicates()
      val sink = "s7_stream_dedup_sink"
      val q = dedup.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // §2.8 — SLIDING windows through Structured Streaming: the streaming
    // twin of q_sliding_window (same 1 h / 30 min overlap, same DuckDB
    // oracle). Same bounded-run construction as s4: AvailableNow +
    // complete mode, so watermark state-purge cannot drop windows.
    "s5_stream_sliding" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = t(ss, dir, "events").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val agg = src
        .withColumn("event_ts", Tables.tsFromNanos(col("ts")))
        .withWatermark("event_ts", "1 hour")
        .groupBy(window(col("event_ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast("double").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
      val sink = "s5_stream_sliding_sink"
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // §2.8 — SESSION windows through Structured Streaming: the streaming
    // twin of q_session_window (gap-based stateful windowing — the shape
    // the reference's event-time model never got). Session-window state
    // merges adjacent sessions per key across micro-batches; AvailableNow
    // + complete mode makes the bounded run equal the batch answer (same
    // gaps-and-islands DuckDB oracle).
    "s5_stream_session" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = t(ss, dir, "events").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val agg = src
        .withColumn("event_ts", Tables.tsFromNanos(col("ts")))
        .withWatermark("event_ts", "1 hour")
        .groupBy(session_window(col("event_ts"), "2 hours").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
          col("n_events"))
      val sink = "s5_stream_session_sink"
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // S6-static — STREAM-STATIC join: the most common production streaming
    // join shape (stream fact × broadcast dimension). Stateless — no
    // watermark, no state store: each micro-batch hash-joins against the
    // broadcast dimension, so a 1000-executor stream pays no shuffle on
    // the fact side. Oracle = the equivalent batch join.
    "s8_stream_static_join" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = t(ss, dir, "events").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val dim = broadcast(t(ss, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")))
      val joined = src.join(dim, col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"), col("c_mktsegment"))
      val sink = "s8_stream_static_join_sink"
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // Streaming twin of q_range_join: a live click stream range-joined
    // against a static (broadcast) interval table through the SAME binned
    // rangeJoin operator — the bin equi-key is what makes the join legal
    // and stateless in Structured Streaming (a raw BETWEEN against a
    // static side would be a nested-loop per micro-batch). Oracle = the
    // batch range join.
    "s9_stream_range_join" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val evBatch = t(ss, dir, "events")
        .withColumn("ts_us", Tables.tsMicros(col("ts")))
      val spikes = broadcast(
        evBatch.where(col("event_type") === "error" && col("value") > 150.0)
          .select(col("event_id").as("spike_id"), col("ts_us").as("start_us"),
            (col("ts_us") + 600000000L).as("end_us")))
      val schema = t(ss, dir, "events").schema
      val clicks = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .where(col("event_type") === "click")
        .withColumn("click_us", Tables.tsMicros(col("ts")))
        .select(col("event_id").as("click_id"), col("user_id"), col("click_us"))
      val joined = Joins.rangeJoin(clicks, spikes,
          "click_us", "start_us", "end_us", binWidth = 600000000L)
        .select(col("spike_id"), col("click_id"), col("user_id"),
          (col("click_us") - col("start_us")).as("gap_us"))
      val sink = "s9_stream_range_join_sink"
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // §2.9 custom stateful operator — flatMapGroupsWithState running totals
    // (the reference's abandoned Semigroup `conflate`,
    // join/package.scala:162-171, industrialized). Batch-gated: the final
    // per-key state equals GROUP BY totals. Values are summed as exact
    // integer cents (integer-valued doubles add associatively — immune to
    // per-group iteration order).
    "t_stateful_running" -> ((s, dir) => {
      import s.implicits._
      val cents = t(s, dir, "events")
        .select(col("user_id"),
          (money(col("value")) * 100).cast("long").as("cents"))
        .as[(Long, Long)]
      graft.streaming.Stateful.runningTotals[(Long, Long)](
          cents, _._1, _._2.toDouble)
        .groupByKey(_.key)
        .reduceGroups((a, b) => if (a.events >= b.events) a else b)
        .map(_._2)
        .toDF()
        .select(col("key").as("user_id"), col("events"),
          col("sum").cast("long").as("sum_cents"))
    }),

    // §2.8 T2 — BACKPRESSURE, data-checked (r9 advice #6: was spec-only).
    // The reference's demand-driven paging (storage.scala:149,172-180;
    // CassandraAsyncStage fetchMore) maps onto Structured Streaming
    // admission control: `maxFilesPerTrigger=1` over a 4-slice staged
    // feed must yield one micro-batch PER FILE, in the controlled mtime
    // order. The gate OBSERVES the per-batch row counts via foreachBatch
    // and returns them as (batch_id, n_rows); slice i holds exactly the
    // event_id % 4 == i rows, so the oracle is a plain GROUP BY — if flow
    // control were ignored (one big batch) or order drifted, row count or
    // hash breaks. The only driver-side state is 4 (id, count) pairs.
    "t_stream_backpressure" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val ev = t(ss, dir, "events").select(col("event_id"))
      val stage = stagedFeed(s"bp#$dir", "graft-bp-src") { st =>
        val now = System.currentTimeMillis()
        (0 to 3).foreach { i =>
          writeStaged(st, ev.where(pmod(col("event_id"), lit(4)) === i),
            s"${('a' + i).toChar}_slice$i", now - (4 - i) * 60000L)
        }
      }
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val src = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val q = src.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          seen.add((batchId, batch.count())): Unit
        }
        .option("checkpointLocation",
          exitManagedTempDir("graft-bp-ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      import ss.implicits._
      seen.asScala.toSeq.filter(_._2 > 0).toDF("batch_id", "n_rows")
    }),

    // §2.9 — the SAME custom stateful operator through Structured
    // Streaming: flatMapGroupsWithState over readStream, checkpointed
    // key state across micro-batches, AvailableNow for the bounded run.
    // Each key's LAST emitted snapshot (max events) is its final running
    // total — equal to batch GROUP BY, the same DuckDB oracle as the
    // batch-gated twin.
    "t_stream_stateful" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      import ss.implicits._
      val schema = t(ss, dir, "events").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .select(col("user_id"),
          (money(col("value")) * 100).cast("long").as("cents"))
        .as[(Long, Long)]
      val totals = graft.streaming.Stateful.runningTotals[(Long, Long)](
        src, _._1, _._2.toDouble)
      val sink = "t_stream_stateful_sink"
      val q = totals.toDF()
        .select(col("key").as("user_id"), col("events"),
          col("sum").cast("long").as("sum_cents"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // one snapshot per key per micro-batch reaches the sink; the final
      // state is the snapshot with the highest event count
      ss.table(sink)
        .groupBy(col("user_id"))
        .agg(max(struct(col("events"), col("sum_cents"))).as("m"))
        .select(col("user_id"), col("m.events").as("events"),
          col("m.sum_cents").as("sum_cents"))
    }),

    // §2.9 — transformWithState (Spark 4's arbitrary-state API, the
    // industrial successor of flatMapGroupsWithState: typed state
    // variables, TTL, RocksDB-backed): canonical-representative streaming
    // dedup — per (user_id, event_type), the MINIMUM event_id ever seen
    // (the "keep lowest doc_id per duplicate group" shape of LLM dedup,
    // deterministic under any row order, unlike first-seen-wins). The
    // last emission per key equals batch GROUP BY MIN — the oracle.
    "t_stream_canonical" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      // transformWithState requires the RocksDB state store provider
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      import ss.implicits._
      val schema = t(ss, dir, "events").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .as[(Long, String, Long)]
      val canon = graft.streaming.Stateful.canonicalDedup(src)
      val sink = "t_stream_canonical_sink"
      val q = canon.toDF().writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // one snapshot per key per micro-batch; the final canonical id is
      // the smallest ever emitted
      ss.table(sink)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("min_event_id")).as("min_event_id"))
    }),

    // S6 sinks, more formats — CSV and JSON roundtrips: write the sink,
    // read it back with the written schema (proves schema + data survive
    // the format, oracle-checked like the parquet roundtrip).
    "src_csv_roundtrip" -> ((s, dir) => {
      val out = exitManagedTempDir("graft_csv").toString
      val df = Joins.inner(t(s, dir, "nation"), "n_regionkey", t(s, dir, "region"), "r_regionkey")
        .select("n_nationkey", "n_name", "r_name")
      df.write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema(df.schema).option("header", "true").csv(out)
    }),
    // Text source, wholetext mode — raw-corpus ingestion (one document
    // per file, the layout crawl dumps and book corpora arrive in):
    // stage 25 docs as UTF-8 .txt files once per JVM, read them back via
    // the text source with `wholetext` (newlines inside a doc survive),
    // recover ids from the `_metadata.file_path` column. Oracle = the
    // same slice of the documents table.
    "src_text_roundtrip" -> ((s, dir) => {
      val stage = stagedFeed(s"textsrc#$dir", "graft-textsrc") { st =>
        t(s, dir, "documents").where(col("doc_id") < 25)
          .select(col("doc_id"), col("text")).collect().foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(st, s"doc_${r.getLong(0)}.txt"),
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
      }
      s.read.option("wholetext", "true").text(stage)
        .select(
          regexp_extract(col("_metadata.file_path"), "doc_(\\d+)\\.txt$", 1)
            .cast("long").as("doc_id"),
          col("value").as("text"))
    }),
    "src_json_roundtrip" -> ((s, dir) => {
      val out = exitManagedTempDir("graft_json").toString
      val df = Joins.inner(t(s, dir, "nation"), "n_regionkey", t(s, dir, "region"), "r_regionkey")
        .select("n_nationkey", "n_name", "r_name")
      df.write.mode("overwrite").json(out)
      s.read.schema(df.schema).json(out)
    }),
    "src_orc_roundtrip" -> ((s, dir) => {
      val out = exitManagedTempDir("graft_orc").toString
      val df = Joins.inner(t(s, dir, "nation"), "n_regionkey", t(s, dir, "region"), "r_regionkey")
        .select("n_nationkey", "n_name", "r_name")
      df.write.mode("overwrite").orc(out)
      s.read.schema(df.schema).orc(out)
    }),

    // §2.7 — full CUBE grouping sets (rollup's sibling).
    "q_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
    }),

    // §2.7 — LATERAL correlated subquery (top-1 order per customer):
    // Catalyst decorrelates the per-row ORDER BY LIMIT into a ranked
    // window join — no per-row re-execution, unlike the reference's
    // index-nested-loop shape this generalizes.
    "q_lateral_topn" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("lat_customer")
      t(s, dir, "orders").createOrReplaceTempView("lat_orders")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
           FROM lat_customer c, LATERAL (
             SELECT o_orderkey, o_totalprice FROM lat_orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
           ) o
           WHERE c.c_acctbal > 9000""")
    }),

    // §2.7 — explicit GROUPING SETS (the general form rollup/cube sugar
    // over): chosen sets (flag, status), (flag), () — Catalyst expands to
    // one Expand + single hash aggregate, not N scans.
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
           FROM gs_lineitem
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
    }),

    // Text analysis — corpus-wide top-k n-gram frequencies (the classic
    // "what boilerplate dominates this corpus" pipeline op): codegen'd
    // shingles explode → hash-aggregate → TakeOrderedAndProject.
    "text_ngram_topk" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(graft.functions.TextOps.shingles(col("text"), 3)).as("ngram"))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("ngram").asc)
        .limit(20)
    }),

    // Custom operator — AS-OF join (SURVEY.md §7.3 "compose existing ops"):
    // each click matched to the user's most recent prior-or-equal purchase.
    // One shuffle on the key (union + per-key window), no range explosion.
    // Oracle: DuckDB's NATIVE ASOF JOIN. Time keys are exact micros longs.
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("ts_us", Tables.tsMicros(col("ts")))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us"))
      Joins.asOf(
          clicks, col("user_id"), col("ts_us"),
          purchases, col("user_id"), col("ts_us"),
          rightPayload = Seq(col("purchase_id"), col("ts_us").as("p_ts_us")),
          rightTieBreak = col("purchase_id"))
        .select(col("click_id"), col("user_id"),
          col("asof.purchase_id").as("purchase_id"),
          (col("ts_us") - col("asof.p_ts_us")).as("gap_us"))
    }),

    // AS-OF join, LEFT variant — unmatched left rows survive with null
    // payload (`keepUnmatched = true`). Oracle: DuckDB ASOF LEFT JOIN.
    "q_asof_left" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("ts_us", Tables.tsMicros(col("ts")))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us"))
      Joins.asOf(
          clicks, col("user_id"), col("ts_us"),
          purchases, col("user_id"), col("ts_us"),
          rightPayload = Seq(col("purchase_id"), col("ts_us").as("p_ts_us")),
          rightTieBreak = col("purchase_id"),
          keepUnmatched = true)
        .select(col("click_id"), col("user_id"),
          col("asof.purchase_id").as("purchase_id"),
          (col("ts_us") - col("asof.p_ts_us")).as("gap_us"))
    }),

    // §2.8 extension — session windows (gap-based): the stateful windowing
    // the reference's event-time data model never got (SURVEY.md §2.8).
    // Session starts/counts are exact integers (unix micros), so the
    // gaps-and-islands SQL in DuckDB reproduces them bit-for-bit.
    "q_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("event_ts", Tables.tsFromNanos(col("ts")))
        .groupBy(session_window(col("event_ts"), "2 hours").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
          col("n_events"))
    }),

    // §2.7 — distribution window functions: ntile buckets + the two
    // rank-ratio statistics. With a unique total order (price desc, key
    // asc) rank == row_number, so percent_rank and cume_dist are exact
    // integer ratios — engine-identical doubles.
    "q_window_dist" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
    }),

    // Interval-OVERLAP join (temporal/genomic overlap): click attention
    // windows [ts, ts+30m] against purchase decision windows [ts, ts+15m]
    // for the same user — binned equi-join with first-shared-bin dedup,
    // never an inequality nested loop. Binning is result-invariant ⇒ the
    // oracle is the plain overlap-predicate join.
    "q_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(Tables.tsFromNanos(col("ts"))).as("us"))
      val c = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("us").as("c_start"), (col("us") + 1800000000L).as("c_end"))
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("us").as("p_start"), (col("us") + 900000000L).as("p_end"))
      Joins.intervalJoin(c, p, "c_start", "c_end", "p_start", "p_end",
          binWidth = 1800000000L, extraKeys = Seq("c_user" -> "p_user"))
        .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"))
    }),

    // §2.7 — ranking window function with deterministic tie-break.
    "q_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("rn"))
    }),

    // §2.7 — lag/lead/first_value event features (the per-user sequence
    // deltas every behavioral training pipeline derives): one window pass
    // per key, total order (event_id tie-break), delta as a single IEEE
    // subtraction over raw doubles.
    "q_window_lag" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").select(col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"),
        first(col("event_type")).over(w).as("first_type"))
    }),

    // §2.7 — higher-order array functions (filter/transform/aggregate/
    // sort), all codegen-free lambda evaluation over the token array in
    // one projection — integer-exact, so the DuckDB list_* forms match.
    "q_array_funcs" -> ((s, dir) => {
      val arr = split(col("text"), " ")
      t(s, dir, "documents").select(col("doc_id"),
        size(filter(arr, x => length(x) > 4)).as("n_long_tokens"),
        array_max(transform(arr, x => length(x))).as("max_token_len"),
        aggregate(transform(arr, x => length(x)), lit(0L),
          (acc, x) => acc + x).as("total_token_chars"),
        size(array_distinct(arr)).as("n_distinct_tokens"),
        element_at(array_sort(array_distinct(arr)), 1).as("first_token_sorted"))
    }),

    // §2.7 — running (cumulative) aggregate per key over the event log.
    "q_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running_value", sum(money(col("value"))).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), col("value"), col("running_value"))
    }),

    // §2.7 — RANGE-framed window (value-based frame: all events within
    // the trailing hour BY TIMESTAMP, not by row count): includes all
    // ts-peers, so the result is deterministic under ties where a ROWS
    // frame would not be. Micros are exact longs; sums are exact cents.
    "q_window_range" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      t(s, dir, "events")
        .withColumn("ts_us", Tables.tsMicros(col("ts")))
        .withColumn("cents", (money(col("value")) * 100).cast("long"))
        .withColumn("sum_cents_1h", sum(col("cents")).over(w))
        .select(col("user_id"), col("event_id"), col("sum_cents_1h"))
    }),

    // §2.6 — top-k (Catalyst fuses to TakeOrderedAndProject: no global sort).
    "q_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // Skew-mitigated salted join — the hot-key spread is result-invariant,
    // so the oracle is the PLAIN join SQL: proof that salting changes the
    // partitioning, never the multiset.
    "j_salted_skew" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 400000.0)
      Joins.saltedInner(li, "l_orderkey", o, "o_orderkey", salts = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
    }),

    // Bloom-pre-filtered semi join — the explicit form of runtime row-level
    // filtering: a bounded sketch of the selective dim side's keys prunes
    // the fact side at the scan, BEFORE the join exchange; the exact semi
    // join downstream removes Bloom false positives. The sketch is
    // result-invariant, so the oracle is the plain IN-subquery SQL — same
    // invariant style as j_salted_skew (salting vs plain join).
    "j_bloom_semi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 400000.0)
      Joins.bloomSemiJoin(li, "l_orderkey", o, "o_orderkey",
          expectedKeys = 100000L, fpp = 0.01)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // The ANTI direction — a negative Bloom probe GUARANTEES
    // non-membership, so ~all fact rows of a selective dim side bypass
    // the join exchange entirely; only the fpp-bounded candidate sliver
    // pays the exact anti join. Result-invariant ⇒ plain NOT-EXISTS SQL.
    "j_bloom_anti" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 400000.0)
      Joins.bloomAntiJoin(li, "l_orderkey", o, "o_orderkey",
          expectedKeys = 100000L, fpp = 0.01)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // Bucketed CO-LOCATED join — the storage-layout lever that makes the
    // 100 TB fact-fact join affordable: both sides are bucketed on the
    // join key at write time (staged once per JVM), so the join reads
    // matching buckets side-by-side with NO exchange on either input
    // (plan-asserted in LayoutSpec; broadcast + AQE disabled in a child
    // session so the exchange-free sort-merge shape is what actually
    // runs). Bucketing is result-invariant ⇒ the oracle is the plain
    // join + aggregate SQL over the raw parquet.
    "j_bucketed_join" -> ((s, dir) => {
      val (oT, lT) = bucketedTables(s, dir)
      val ss = s.newSession()
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      ss.table(oT).join(ss.table(lT), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("l_extendedprice")) *
            (money(lit(1.0)) - money(col("l_discount"))))
            .cast("double").as("revenue"))
    }),

    // §2.4 extension — left outer join with an ON-clause filter so unmatched
    // rows survive as nulls (absent in the reference; free in Spark).
    "q_join_left" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val li = t(s, dir, "lineitem").where(col("l_quantity") >= 49.0)
      p.join(li, p("p_partkey") === li("l_partkey"), "left")
        .select(col("p_partkey"), col("l_orderkey"), col("l_quantity"))
    }),

    // §2.4 extension — full outer join (both unmatched sides survive).
    "q_join_full" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val li = t(s, dir, "lineitem").where(col("l_quantity") >= 49.0)
      p.join(li, p("p_partkey") === li("l_partkey"), "full_outer")
        .select(col("p_partkey"), col("l_orderkey"), col("l_quantity"))
    }),

    // §2.4 extension — semi join (EXISTS).
    "q_join_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // §2.4 extension — anti join (NOT EXISTS).
    "q_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // §2.7 — hierarchical aggregate (ROLLUP) with grouping-set semantics.
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
    }),

    // §2.5 extension — set operations the reference lacks (SURVEY.md §2.5).
    "q_intersect" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.where(col("l_quantity") >= 49.0).select(col("l_partkey"))
        .intersect(li.where(col("l_quantity") <= 2.0).select(col("l_partkey")))
    }),
    // the BAG-semantics (ALL) twins: multiplicities are preserved, so
    // duplicates count — a different aggregate shape than the DISTINCT
    // forms (count-compare per key, no dedup)
    "q_intersect_all" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.where(col("l_quantity") >= 49.0).select(col("l_partkey"))
        .intersectAll(li.where(col("l_quantity") <= 2.0).select(col("l_partkey")))
    }),
    "q_except_all" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.select(col("l_partkey"))
        .exceptAll(li.where(col("l_returnflag") === "A").select(col("l_partkey")))
    }),
    "q_except" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.where(col("l_quantity") >= 49.0).select(col("l_partkey"))
        .except(li.where(col("l_quantity") <= 2.0).select(col("l_partkey")))
    }),

    // §2.7 extension — scalar function library (string/date/math built-ins
    // the reference delegates to Scala lambdas; here they're codegen'd
    // Catalyst functions with DuckDB-matching semantics).
    "q_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .where(col("o_orderkey") <= 1000)
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("prio_upper"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"),
          length(col("o_orderstatus")).as("status_len"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"),
          dayofmonth(col("o_orderdate")).as("order_day"),
          (money(col("o_totalprice")) - money(lit(100000.0))).cast("double").as("delta"),
          abs((money(col("o_totalprice")) - money(lit(100000.0))).cast("double")).as("abs_delta"),
          greatest(col("o_custkey"), col("o_orderkey")).as("max_key"))
    }),

    // §2.7 extension — pivot (wide aggregation); DuckDB oracle uses
    // FILTER-ed conditional aggregates for the same shape.
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"))
    }),

    // §2.7 extension — unpivot (long-form reshape, the inverse of pivot):
    // 4 measure columns melt to (metric, value) rows. Map-only expansion
    // (each input row emits 4 output rows in the same task — no shuffle);
    // DuckDB runs its native UNPIVOT for the identical reshape.
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem").where(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
    }),

    // §2.7 extension — grouped array aggregation (nested result type):
    // the per-key DISTINCT set, SORTED so the array value is
    // deterministic under any partitioning/arrival order. Partial
    // aggregation combines the sets map-side. The set is emitted as a
    // comma-joined STRING, not a raw array: the driver's oracle harness
    // sorts result rows with pandas, which cannot order numpy array
    // cells (r5 `q_collect_list` err) — serializing keeps the value
    // comparable while the aggregation under test is unchanged.
    "q_collect_list" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
          count(lit(1)).as("n_events"))
    }),

    // §2.7 — exact percentiles (sort-based, linear interpolation — the
    // deterministic form; approx quantile sketches are rows-only land).
    "q_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.25)).as("p25"),
          percentile(col("l_quantity"), lit(0.5)).as("p50"),
          percentile(col("l_quantity"), lit(0.75)).as("p75"))
    }),

    // §2.7 — scalar subquery in a predicate (orders in the top decile of
    // the global max price).
    "q_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_ssq_v")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders_ssq_v
               WHERE o_totalprice >= 0.9 * (SELECT MAX(o_totalprice) FROM orders_ssq_v)""")
    }),

    // §2.7 — exact distinct aggregation.
    "q_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // §2.7 — approximate distinct (HLL++). Deterministic in Spark but not
    // DuckDB-comparable → rows-only check by design.
    // Differential gate (r8): HLL++ estimates are not SQL-reproducible,
    // but the EXACT distinct counts are, and the estimator's contract
    // (relative error within 3×rsd of the default rsd=0.05) is a checkable
    // boolean. A broken sketch (or a broken merge of partial sketches)
    // breaks the booleans; the exact counts hash-verify the rest.
    "q_approx_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def within(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
        (abs(approx - exact).cast("double") / exact.cast("double")) <= 0.15
      li.agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        within(approx_count_distinct(col("l_partkey")),
          countDistinct(col("l_partkey"))).as("parts_within_tol"),
        within(approx_count_distinct(col("l_orderkey")),
          countDistinct(col("l_orderkey"))).as("orders_within_tol"))
    }),

    // §2.7 — approximate percentile (KLL-style sketch): mergeable bounded
    // state vs the exact form's full sort. Differential gate: the sketch
    // value is not SQL-reproducible, but its CONTRACT is — the approx
    // result's true rank interval [count(<v), count(<=v)] must intersect
    // [q·n − n/acc, q·n + n/acc] (accuracy=1000). The exact percentile
    // (interpolated, = DuckDB quantile_cont, proven by q_percentile)
    // hash-verifies alongside the booleans.
    "q_approx_percentile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("apx50"),
        percentile_approx(col("l_quantity"), lit(0.9), lit(1000)).as("apx90"),
        count(lit(1)).as("n"))
      def rankOk(apx: org.apache.spark.sql.Column, q: Double) = {
        val lo = sum(when(col("l_quantity") < apx, 1L).otherwise(0L))
        val hi = sum(when(col("l_quantity") <= apx, 1L).otherwise(0L))
        val tol = first(col("n")).cast("double") / 1000.0
        val target = first(col("n")).cast("double") * q
        (lo.cast("double") <= target + tol) && (hi.cast("double") >= target - tol)
      }
      li.crossJoin(broadcast(a)).agg(
        expr("percentile(l_quantity, 0.5)").as("exact_p50"),
        expr("percentile(l_quantity, 0.9)").as("exact_p90"),
        rankOk(col("apx50"), 0.5).as("p50_rank_ok"),
        rankOk(col("apx90"), 0.9).as("p90_rank_ok"))
    }),

    // §2.4/§2.7 extension — 3-way join + aggregation + top-k (TPC-H Q3
    // shape): the classic multi-join plan Catalyst reorders/broadcasts.
    "q3_shipping" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(o("o_orderkey").as("o_orderkey"),
          o("o_orderdate").cast("date").as("order_date"))
        .agg(sum(money(col("l_extendedprice")) * (money(lit(1.0)) - money(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // ---- LLM-data-pipeline extensions (north star; SURVEY.md §7.2 M6) ----

    // The flagship composition: a full training-data cleaning pass —
    // quality gate → language gate → exact dedup (keep min id) → token
    // accounting — each stage an already-oracle-proven operator, composed
    // through the `|>` pipe. All per-row text signals come from ONE fused
    // byte-level traversal (TextSignals struct) materialized up front —
    // the previous composed form re-ran split + five regexp_extract_all
    // passes in the quality filter, the language filter, AND the final
    // projection, and was the slowest bench entry. Values are bit-identical
    // (TextSignalsSpec), so the DuckDB regex oracle is unchanged.
    // End-to-end SESSION FUNNEL — the flagship product-analytics
    // composite: sessionize the event log (2 h inactivity gap, the
    // q_session_window islands), then measure ordered progression
    // view → click → purchase WITHIN each session. Order sensitivity is
    // the hard part: a click counts only AFTER the session's first view,
    // a purchase only after the first qualifying click — running-min
    // windows in RANGE mode (peer rows at equal timestamps included, so
    // both engines agree under ties). All windows are partitioned by
    // (user, session): parallel across users at any scale, never global.
    "pipe_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "events").select(col("user_id"), col("event_type"),
        unix_micros(Tables.tsFromNanos(col("ts"))).as("us"))
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("us"))
      val prev = lag(col("us"), 1).over(wOrd)
      val withSid = e
        .withColumn("new_s",
          when(prev.isNull || col("us") - prev >= 7200000000L, 1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val wr = Window.partitionBy(col("user_id"), col("sid")).orderBy(col("us"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val funnel = withSid
        .withColumn("fv", min(when(col("event_type") === "view", col("us"))).over(wr))
        .withColumn("qc", when(col("event_type") === "click" && col("fv").isNotNull, col("us")))
        .withColumn("fc", min(col("qc")).over(wr))
        .withColumn("qp", when(col("event_type") === "purchase" && col("fc").isNotNull, col("us")))
      funnel.groupBy(col("user_id"), col("sid"))
        .agg(max(when(col("fv").isNotNull, 1).otherwise(0)).as("s1"),
          max(when(col("qc").isNotNull, 1).otherwise(0)).as("s2"),
          max(when(col("qp").isNotNull, 1).otherwise(0)).as("s3"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("s1")).cast("long").as("reached_view"),
          sum(col("s2")).cast("long").as("reached_click"),
          sum(col("s3")).cast("long").as("reached_purchase"))
    }),

    "pipe_clean_corpus" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val keep = docs
        .groupBy(md5(col("text").cast("binary")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      docs |>
        (d => d.select(col("doc_id"), TextAnalysis.signals(col("text")).as("sig"))) |>
        (d => d.where(TextAnalysis.qualityScoreFromSignals(col("sig")) >= 0.5)) |>
        (d => d.where(TextAnalysis.langIdFromSignals(col("sig")) === "en")) |>
        (d => d.join(keep, Seq("doc_id"), "left_semi")) |>
        (d => d.select(col("doc_id"),
          col("sig.n_words").as("ws_tokens"),
          TextAnalysis.qualityScoreFromSignals(col("sig")).as("quality")))
    }),

    // The END-TO-END training-corpus build: pipe_clean_corpus plus the
    // train/eval split and benchmark decontamination — train docs only,
    // quality-gated, language-gated, exact-deduped (against the WHOLE
    // corpus incl. eval, so a train copy of an eval doc dies twice), and
    // stripped of anything sharing an 8-gram with the eval split. Same
    // planted contamination as text_decontaminate so the stage provably
    // removes rows at every scale factor. Per-row signals still come from
    // the single fused traversal; the decontamination stage adds one
    // broadcast probe + one anti-join — the whole pipeline stays one
    // corpus scan plus hash-partitioned metadata joins.
    // RAG indexing prep, end-to-end: token-window chunking → per-chunk
    // quality scoring (the IEEE-mirrored composed form, same discipline
    // as text_quality) → best chunk per document (partial-aggregated
    // min(struct), no corpus-wide window) → join the document's embedding
    // payload. The shape every retrieval index build runs: chunk, score,
    // select, attach vectors.
    "pipe_rag_index" -> ((s, dir) => {
      val chunks = Corpus.chunkTokens(t(s, dir, "documents"),
        "doc_id", "text", chunkSize = 64, overlap = 16)
      val scored = chunks.select(col("doc_id"), col("chunk_id"),
          TextAnalysis.qualityScore(col("chunk_text")).as("quality"))
        .where(col("quality").isNotNull)
      val best = scored.groupBy(col("doc_id"))
        .agg(min(struct((-col("quality")).as("negq"),
          col("chunk_id").as("chunk_id"))).as("m"))
        .select(col("doc_id"), col("m.chunk_id").as("best_chunk"),
          (-col("m.negq")).as("quality"))
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("label"))
      best.join(emb, Seq("doc_id"))
    }),

    "pipe_training_corpus" -> ((s, dir) => {
      // seeded feeds FOUR consumers (dedup keeper set, both contamination
      // sides, the main signal scan) — persist once so the corpus is read
      // once, same discipline as the LSH signature stages (Bench/Verify
      // clear the cache per query)
      val seeded = seededDocs(t(s, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val keep = seeded.groupBy(md5(col("text").cast("binary")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val contaminated = Dedup.contamination(seeded, "doc_id", "text",
          col("doc_id") < 40, shingleLen = 8)
        .select(col("doc_id"))
      seeded |>
        (d => d.where(col("doc_id") >= 40)) |>
        (d => d.select(col("doc_id"), TextAnalysis.signals(col("text")).as("sig"))) |>
        (d => d.where(TextAnalysis.qualityScoreFromSignals(col("sig")) >= 0.5)) |>
        (d => d.where(TextAnalysis.langIdFromSignals(col("sig")) === "en")) |>
        (d => d.join(keep, Seq("doc_id"), "left_semi")) |>
        (d => d.join(contaminated, Seq("doc_id"), "left_anti")) |>
        (d => d.select(col("doc_id"), col("sig.n_words").as("ws_tokens"),
          TextAnalysis.qualityScoreFromSignals(col("sig")).as("quality")))
    }),

    // Exact dedup: hash-groupBy on a content fingerprint.
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Paragraph-level dedup (the C4/Dolma sub-document pass): boilerplate
    // that repeats across globally-unique pages survives document dedup —
    // this drops every repeated paragraph except its (min doc_id, min pos)
    // canonical site and reassembles the survivors. The corpus is flat
    // single-line text, so the gate synthesizes paragraph structure
    // deterministically (8-word paragraphs, '\n'-joined) — the tiny word
    // vocabulary makes cross-document paragraph collisions real, so the
    // dedup BINDS; the oracle replays the same framing and keep rule.
    "dedup_paragraphs" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val nPara = ceil(size(toks) / lit(8.0)).cast("int")
      val paraed = t(s, dir, "documents").select(col("doc_id"),
        array_join(transform(sequence(lit(0), nPara - 1),
          i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")), "\n").as("text"))
      Dedup.dedupParagraphs(paraed, "doc_id", "text", "\n")
    }),

    // Normalization-then-dedup — the composition normalization exists
    // for: byte-different trivial variants (case, whitespace runs,
    // lead/trail padding) must collapse to ONE group. The corpus is
    // already clean, so each doc gets a deterministically-messied twin
    // (id + 100000): leading spaces, uppercased prefix, a trailing
    // space+tab. After nfc→fold→collapse, twin == original, so every
    // group is exactly {id, id+100000} (modulo pre-existing exact dups)
    // with the original id canonical. One hash-groupBy shuffle.
    "dedup_normalized" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val twins = docs.select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("  "), upper(substring(col("text"), 1, 15)),
          substring(col("text"), 16, 1000000), lit(" \t")).as("text"))
      val clean = TextNormalize.collapseWhitespace(
        TextNormalize.foldCase(TextNormalize.nfc(col("text"))))
      docs.select(col("doc_id"), col("text")).unionByName(twins)
        .select(col("doc_id"), md5(clean.cast("binary")).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))
    }),

    // Exact n-gram Jaccard near-dup pairs (SQL-oracle-able exact path).
    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleLen = 3, threshold = 0.8)
    }),

    // Edit-distance VERIFICATION of near-dup candidates — the
    // character-level second opinion a shingle signal can't give (word
    // reorderings share shingle sets; levenshtein catches them).
    // Quadratic per pair, so it runs on the CANDIDATE pairs only (the
    // scale discipline of every verify stage) over a bounded 400-char
    // prefix; both engines implement classic unit-cost Levenshtein.
    "dedup_edit_distance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleLen = 3, threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
      val ta = docs.select(col("doc_id").as("doc_a"),
        substring(col("text"), 1, 400).as("ta"))
      val tb = docs.select(col("doc_id").as("doc_b"),
        substring(col("text"), 1, 400).as("tb"))
      pairs.join(ta, "doc_a").join(tb, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("ta"), col("tb")).as("edit_dist"))
    }),

    // Prefix-filtered exact Jaccard pairs (AllPairs/PPJoin candidate
    // discipline): candidates join only on each doc's rarest-shingle
    // prefix under a global df order — lossless filter, exact verify —
    // so the result is IDENTICAL to brute-force Jaccard at the same
    // threshold. Run at t=0.7 (vs the exploded path's 0.8) so the gate
    // also exercises a different cutoff; the oracle is the same
    // brute-force SQL with 0.7.
    "dedup_jaccard_prefix" -> ((s, dir) => {
      Dedup.jaccardPrefixPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleLen = 3, threshold = 0.7)
    }),

    // MinHash+LSH near-dup pairs, exact-verified. Same oracle as the exact
    // path: with 16 bands × 4 rows the S-curve catches j>=0.8 with
    // P>0.999, so the verified output equals the exact answer.
    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleLen = 3, bands = 16, rowsPerBand = 4, threshold = 0.8)
    }),

    // SimHash fingerprints (hash family not DuckDB-expressible: rows-only;
    // hamming behavior spec-verified in DedupSpec).
    // Differential gate (r8): the fingerprint values are xxhash64-based
    // (not DuckDB-expressible), but two REAL invariants of the
    // implementation are checkable booleans: simhash is a pure function of
    // the distinct-token SET (the majority vote sums sign bits — order
    // free), so the fingerprint of the token-REVERSED document must be
    // identical (catches any position-dependent or non-commutative drift);
    // and every fingerprint must fit the documented 52-bit range.
    "dedup_simhash" -> ((s, dir) => {
      val fp = Dedup.simhash(col("text"))
      val reversedText = concat_ws(" ", reverse(split(col("text"), " ")))
      t(s, dir, "documents").select(
        col("doc_id"),
        (fp === Dedup.simhash(reversedText)).as("order_invariant"),
        (fp >= 0L && fp < lit(1L << 52)).as("in_range"))
    }),

    // Duplicate-CLUSTER resolution on top of pairwise dedup: connected
    // components over the near-dup edge set, every doc labeled with its
    // cluster's minimum doc_id (the keeper). Pairwise output alone
    // over-deletes on A~B, B~C chains; this is the transitive-closure
    // step every production dedup pipeline runs after candidate pairing.
    // Edges = exact n-gram Jaccard pairs (the oracle-able pair source)
    // UNION a planted 3-hop chain per doc_id < 50 (id—id+100000—
    // id+200000—id+300000): the chain's far end resolves to the REAL
    // doc's cluster minimum only if labels propagate multiple hops, so
    // the oracle (DuckDB recursive CTE) checks true transitivity, not
    // just 1-hop pair symmetry. Output covers docs ∪ chain nodes;
    // singletons map to themselves.
    "dedup_cluster_cc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val natural = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleLen = 3, threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
      val low = docs.select(col("doc_id")).where(col("doc_id") < 50)
      def shifted(by: Long) = low.select((col("doc_id") + by).as("doc_id"))
      val chain = low.select(col("doc_id").as("doc_a"),
          (col("doc_id") + 100000L).as("doc_b"))
        .unionByName(low.select((col("doc_id") + 100000L).as("doc_a"),
          (col("doc_id") + 200000L).as("doc_b")))
        .unionByName(low.select((col("doc_id") + 200000L).as("doc_a"),
          (col("doc_id") + 300000L).as("doc_b")))
      val cc = Dedup.connectedComponents(
        natural.unionByName(chain), "doc_a", "doc_b")
      val nodes = docs.select(col("doc_id"))
        .unionByName(shifted(100000L)).unionByName(shifted(200000L))
        .unionByName(shifted(300000L)).distinct()
      nodes.join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("canon_id"), col("doc_id")).as("canon_id"))
    }),

    // Exact-substring duplication (Lee et al.): doc pairs sharing any
    // contiguous 20-token span — catches partial overlap (syndicated
    // paragraphs, quoted blocks) that whole-doc jaccard misses. Exploded
    // hash-keyed equi-join, never all-pairs.
    "dedup_substring" -> ((s, dir) => {
      Dedup.sharedSubstringPairs(t(s, dir, "documents"), "doc_id", "text",
        windowTokens = 20)
    }),

    // The same operator with the boilerplate/heavy-hitter dial ENGAGED
    // (round-7 verdict #4): spans appearing in more than maxDocFreq
    // documents are dropped before pairing, which is what keeps the pair
    // space from going quadratic on template text at large scale factors.
    // The oracle applies the identical HAVING df <= cap filter, so the
    // dial itself is hash-verified, not just the uncapped exact form.
    "dedup_substring_capped" -> ((s, dir) => {
      Dedup.sharedSubstringPairs(t(s, dir, "documents"), "doc_id", "text",
        windowTokens = 20, maxDocFreq = Some(3))
    }),

    // Incremental ingest dedup: a synthesized "today's crawl" batch (every
    // 11th doc re-ingested under a new id, half byte-identical to the
    // corpus copy, half genuinely extended) anti-joined against the
    // existing corpus's content hashes — the byte-identical half must
    // vanish, the fresh half survives with an in-batch keep-min collapse.
    // Both engines synthesize the identical batch (md5 parity is already
    // proven by dedup_exact).
    "dedup_incremental" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = corpus.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          when(col("doc_id") % 2 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" fresh content"))).as("text"))
      Dedup.incremental(batch, corpus, "doc_id", "text")
    }),

    // Per-label embedding centroids — the deterministic sorted-fold AUDIT
    // form (bit-stable cross-engine, hence hashable); the production
    // sum/count scale path is Similarity.labelCentroids, spec-proven to
    // agree within 1e-9 relative error.
    "sim_label_centroids" -> ((s, dir) => {
      Similarity.labelCentroidsAudit(t(s, dir, "embeddings"),
        "vec_id", "embedding", "label")
    }),

    // Lloyd k-means as a first-class operator (IVF cell training /
    // SemDeDup cluster pruning primitive): deterministic seeds (k
    // smallest ids), 2 iterations, audit-form centroids — the oracle
    // unrolls the same two iterations in SQL and must reproduce every
    // assignment. Scale path is Similarity.kmeansLloyd (sum/count
    // centroids), spec-proven to assign identically.
    "sim_kmeans" -> ((s, dir) => {
      Similarity.kmeansLloydAudit(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2)
    }),

    // Canonical selection by QUALITY, not min-id: per near-dup cluster,
    // keep the highest-quality member (doc_id breaks exact quality ties)
    // — what a production dedup actually ships, since the lowest id is
    // arbitrarily often the worst copy. Clusters come from the same
    // pointer-jumping CC as dedup_cluster_cc; the keeper is one
    // partial-aggregated max(struct(quality, doc_id)) per cluster — no
    // window over the corpus, no skew on singleton clusters. Quality is
    // the text_quality expression, already proven IEEE-identical to the
    // oracle.
    "dedup_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleLen = 3, threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
      val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      val member = docs.select(col("doc_id")).join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("canon_id"), col("doc_id")).as("canon_id"))
      // fused one-pass signals (bit-identical to the regex-composed form,
      // TextSignalsSpec) — the 5-regex quality scan was measurable here
      val q = docs.select(col("doc_id"),
        TextAnalysis.qualityScoreFromSignals(
          TextAnalysis.signals(col("text"))).as("quality"))
      member.join(q, "doc_id")
        .groupBy(col("canon_id"))
        .agg(max(struct(col("quality"), col("doc_id"))).as("m"))
        .select(col("canon_id"), col("m.doc_id").as("keep_id"),
          col("m.quality").as("keep_quality"))
    }),

    // SemDeDup-style SEMANTIC dedup (the public SemDeDup recipe: embedding
    // near-dup pairs → transitive clusters → one kept representative per
    // cluster) — end-to-end composition of three oracle-proven stages:
    // cosine pairs at θ=0.45 (where the synthetic corpus has natural
    // pairs), the same pointer-jumping CC as dedup_cluster_cc, and a
    // deterministic min-id representative. Output: every vector, its
    // cluster canon, and whether semantic dedup keeps it.
    "dedup_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val pairs = Similarity.cosinePairsLsh(emb, "vec_id", "embedding", 0.45)
        .select(col("id_a"), col("id_b"))
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      emb.select(col("vec_id"))
        .join(cc, col("vec_id") === col("doc_id"), "left")
        .select(col("vec_id"),
          coalesce(col("canon_id"), col("vec_id")).as("canon_id"),
          (coalesce(col("canon_id"), col("vec_id")) === col("vec_id")).as("kept"))
    }),

    // Embedding near-dup pairs at a LOOSE audit threshold (0.45). The
    // auto plan here is the exact-verify cross join: at θ < 0.6 no
    // hyperplane-LSH geometry prunes (the 64×4 banding that holds recall
    // admits ~98% of all random pairs as candidates — measured), so the
    // banded plan is the same Θ(n²) plus a 64× explosion, a distinct,
    // and two fetch joins; the exact plan is 3.5× faster for the
    // identical answer (see cosinePairsLsh scaladoc). Subquadratic
    // embedding dedup lives at realistic thresholds — the θ=0.9 gate
    // below is the banded scale path.
    "dedup_embedding_cosine" -> ((s, dir) => {
      Similarity.cosinePairsLsh(t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
    }),

    // The same operator at a REALISTIC near-dup threshold (θ=0.9): the
    // threshold-aware geometry picks NARROW (many-plane) bands here, so
    // a random pair collides in a band with probability 2^-planes ≈ 1e-4
    // instead of the 4-plane setting's 1/16 — the candidate join stays
    // truly subquadratic as the corpus grows (the 4-plane geometry's
    // cost visibly doubled when the r5 twin-planting doubled the corpus).
    // Oracle is the exact all-pairs SQL at the same threshold.
    //
    // The synthetic corpus has no natural pair above cos ≈ 0.60, so the
    // raw θ=0.9 comparison was two EMPTY result sets (r4 advice #2). Each
    // vector gets a planted twin (vec_id+100000, 2·v): doubling is exact
    // in both engines (power of two), cosine-invariant, and SIGN-invariant
    // per hyperplane, so every {v, 2v} pair is a guaranteed ≥0.9 hit the
    // banded path must surface — the oracle now compares n non-empty rows.
    // Recall on non-identical signatures is SimilaritySpec's planted
    // perturbed-pair test; this gate proves the end-to-end plumbing.
    "dedup_embedding_cosine_t90" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val twins = emb.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      Similarity.cosinePairsLsh(emb.unionByName(twins), "vec_id", "embedding", 0.9)
    }),

    // Symmetric int8 embedding quantization (4× storage compression for
    // corpus-scale vector serving): map-only, no shuffle; rounding is the
    // engine-stable floor(y + 0.5) so the oracle reproduces every element.
    // The codes array is emitted comma-joined (NULL elements as "null"):
    // the driver's pandas-based compare cannot sort numpy array cells
    // (r4/r5 `sim_quantize_int8` err), and the serialization is exact for
    // integers so every element is still oracle-checked.
    "sim_quantize_int8" -> ((s, dir) => {
      Similarity.quantizeInt8(t(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("scale"),
          array_join(transform(col("q"),
            x => coalesce(x.cast("string"), lit("null"))), ",").as("q"))
    }),

    // Brute-force cosine top-k for a fixed query set (broadcast queries,
    // one corpus pass).
    "sim_brute_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
    }),

    // MIPS (max inner product) top-k — the recommender retrieval mode:
    // raw dot, magnitude kept. Same bit-exact dot convention as the
    // cosine gates, so the oracle ranks list_dot_product directly.
    "sim_mips_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.mipsTopK(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    // Binary (1-bit sign) quantization + Hamming top-k: the XOR+popcount
    // memory tier of a production retrieval stack — 64 dims become two
    // 32-bit-packed longs, distance is integer-exact in both engines, so
    // the oracle replicates packing and ranking bit-for-bit.
    "sim_binary_hamming" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.binaryHammingTopK(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 5)
    }),

    // LSH-bucketed approximate top-k (recall/plan tradeoff: equi-join on
    // sign buckets instead of a full scan per query). FULLY oracled
    // (round-7 verdict #2): the seeded hyperplanes are deterministic
    // literals, so the DuckDB oracle interpolates the exact plane values
    // and replicates bucket = Σ 2^j·[dot(v,plane_j)>0] — the sign of a
    // bit-identical double dot product is itself bit-identical (the brute
    // gate already proves dot bit-equality between the engines).
    "sim_lsh_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nPlanes = 6)
    }),

    // ANN QUALITY measurement — recall@5 of the LSH path against brute
    // force, per query: the dial every approximate index is tuned by
    // (recall vs candidate volume). Both rankings are themselves
    // oracle-gated, so the oracle here is their SQL composition — the
    // recall arithmetic is one exact count / k division. On the
    // UNIFORM-RANDOM test embeddings, 6 planes = 64 buckets yields
    // near-zero recall — which is precisely what this gate exists to
    // surface: the measurement catches a mis-tuned index before
    // production does (real corpora cluster; random vectors are LSH's
    // adversarial case).
    "sim_lsh_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 5, nPlanes = 6)
        .select(col("query_id").as("lq"), col("neighbor_id").as("ln"))
      brute.join(lsh,
          col("query_id") === col("lq") && col("neighbor_id") === col("ln"), "left")
        .groupBy(col("query_id"))
        .agg((count(col("ln")).cast("double") / 5.0).as("recall"))
    }),

    // IVF ANN (the KMeans-quantizer scale path). Build/probe are split:
    // the quantizer is built ONCE per (dir, nlist) and registered — query
    // executions probe the persisted inverted file, they never retrain.
    // Differential gate (round-7 verdict #2): the trained centroids are
    // not SQL-expressible, but per-query INVARIANTS of a correct probe
    // are — the result must carry exactly k rows, ranks must be the
    // (score desc, neighbor_id asc) row sequence (independently recomputed
    // with a window, checking the TopK aggregator's ordering), and every
    // returned score must EXACTLY equal the cosine recomputed from the raw
    // embeddings table (same expression shape ⇒ bit-equal when correct).
    "sim_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probe = Similarity.ivfTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nlist = 8, nprobe = 3,
          indexKey = Some(s"$dir#nlist=8"))
      annInvariants(probe, emb)
    }),

    // IVF BATCH-probe plan (round-8 verdict #7): maxBroadcastQueries=0
    // forces the path a million-query batch join takes — the probe set is
    // NEVER broadcast; candidate matching is a shuffled cell equi-join
    // (and at nprobe=1 probe ranking is a map-only literal-centroid
    // argmax). Scoring/ranking expressions are shared with the probe
    // path, so the same bit-exact invariants gate it.
    "sim_ivf_batch" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val index = Similarity.ivfBuildOrGet(s"$dir#nlist=8", emb,
        "vec_id", "embedding", nlist = 8)
      val probe = Similarity.ivfProbe(index, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nprobe = 3, maxBroadcastQueries = 0)
      annInvariants(probe, emb)
    }),

    // IVF probed EXHAUSTIVELY (nprobe = nlist): every cell is a candidate
    // cell, so the probe must EQUAL brute force row-for-row — assignment,
    // inverted-file layout, candidate join, scoring and ranking are all on
    // the hook. Oracle = the same brute-force SQL sim_brute_topk passes.
    "sim_ivf_exhaustive" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nlist = 8, nprobe = 8,
          indexKey = Some(s"$dir#nlist=8"))
    }),

    // Product-quantization ANN (FAISS-style PQ8x16 + ADC): the corpus is
    // encoded once as 8 subspace code ids (~32× smaller than the raw
    // floats — the memory form a 100 TB index actually ships), queries
    // score codes via per-query lookup tables. Differential gate: trained
    // codebooks are not SQL-expressible, but a correct ADC probe must emit
    // exactly k distinct ranked rows per query AND its LUT-summed score
    // must match an independent reconstruction — dot(q̂, decode(codes)),
    // the codes fetched back from the registered index — within float
    // re-association tolerance (the two formulations sum the same terms
    // in different order). SimilaritySpec keeps planted-twin recall.
    "sim_pq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 10)
      val probe = Similarity.pqTopK(emb, queries,
          "vec_id", "embedding", k = 5, m = 8, ksub = 16,
          indexKey = Some(s"$dir#pq8x16"))
      val index = Similarity.pqBuildOrGet(s"$dir#pq8x16", emb, "vec_id", "embedding")
      // decode(codes): concat of the selected per-subspace centroids —
      // reconstructed corpus vector in the quantized space
      val decoded = index.encoded.select(col("neighbor_id"),
        flatten(zip_with(col("codes"),
          typedLit((0 until index.m).map(j => index.codebooks(j).map(_.toSeq).toSeq)),
          (c, book) => element_at(book, c + lit(1)))).as("rv"))
      val qn = queries.select(col("vec_id").as("query_id"),
        transform(col("embedding").cast("array<double>"),
          x => x / Similarity.l2norm(col("embedding"))).as("qvn"))
      val checked = probe
        .join(decoded, Seq("neighbor_id"))
        .join(broadcast(qn), Seq("query_id"))
        .withColumn("recon", Similarity.dot(col("qvn"), col("rv")))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      checked
        .withColumn("expected_rank", row_number().over(w))
        .groupBy(col("query_id"))
        .agg(
          count(lit(1)).cast("int").as("n_results"),
          countDistinct(col("neighbor_id")).cast("int").as("n_distinct"),
          sum(when(col("rank") === col("expected_rank"), 1).otherwise(0))
            .cast("int").as("n_rank_ok"),
          (max(abs(col("score") - col("recon"))) < 1e-9).as("scores_match_recon"))
    }),

    // IVF+PQ composed probe (FAISS IVFx,PQy — the production shape of a
    // corpus-scale ANN index): IVF cuts candidates to the query's nprobe
    // cells, PQ ADC scores ONLY those candidates from their m-byte codes.
    // Same invariant gate as sim_pq_topk: exactly k distinct ranked rows
    // per query, ranks = the recomputed (score desc, id asc) sequence,
    // ADC score equals the decode-and-dot reconstruction within
    // re-association tolerance.
    "sim_ivfpq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 10)
      val ivf = Similarity.ivfBuildOrGet(s"$dir#nlist=8", emb,
        "vec_id", "embedding", nlist = 8)
      val pq = Similarity.pqBuildOrGet(s"$dir#pq8x16", emb, "vec_id", "embedding")
      val probe = Similarity.ivfPqTopK(ivf, pq, queries,
        "vec_id", "embedding", k = 5, nprobe = 3)
      val decoded = pq.encoded.select(col("neighbor_id"),
        flatten(zip_with(col("codes"),
          typedLit((0 until pq.m).map(j => pq.codebooks(j).map(_.toSeq).toSeq)),
          (c, book) => element_at(book, c + lit(1)))).as("rv"))
      val qn = queries.select(col("vec_id").as("query_id"),
        transform(col("embedding").cast("array<double>"),
          x => x / Similarity.l2norm(col("embedding"))).as("qvn"))
      val checked = probe
        .join(decoded, Seq("neighbor_id"))
        .join(broadcast(qn), Seq("query_id"))
        .withColumn("recon", Similarity.dot(col("qvn"), col("rv")))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      checked
        .withColumn("expected_rank", row_number().over(w))
        .groupBy(col("query_id"))
        .agg(
          count(lit(1)).cast("int").as("n_results"),
          countDistinct(col("neighbor_id")).cast("int").as("n_distinct"),
          sum(when(col("rank") === col("expected_rank"), 1).otherwise(0))
            .cast("int").as("n_rank_ok"),
          (max(abs(col("score") - col("recon"))) < 1e-9).as("scores_match_recon"))
    }),

    // Language ID: stopword-hit argmax (cheap function-word heuristic).
    "text_langid" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("pred_lang"),
        TextAnalysis.langHits(col("text"), "en").as("en_hits"))
    }),

    // Quantile quality pruning WITHIN each source (the FineWeb-style
    // "keep the best half of every dump" step — a global cut would let
    // one high-scoring domain crowd out the rest): ntile(2) over a
    // per-source window on the bit-equal quality score (unique tiebreak
    // by doc_id), keep tile 1. Parallel across sources; the integer
    // ntile avoids any threshold-float comparison.
    "corpus_quality_filter" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      docs.withColumn("half", ntile(2).over(w)).where(col("half") === 1)
        .select(col("doc_id"), col("source"), col("quality"))
    }),

    // Quality scoring: integer counts + deterministic double ratios.
    "text_quality" -> ((s, dir) => {
      val sig = TextAnalysis.qualitySignals(col("text"))
      // quality stays UNROUNDED: the expression tree mirrors the oracle
      // op-for-op so the doubles are IEEE-identical, while rounding can hit
      // decimal round-half ties (found at sf0.1: 0.5143125 rounded up by
      // Spark, down by DuckDB).
      t(s, dir, "documents").select(
        col("doc_id") +: sig.map { case (n, c) => c.as(n) } :+
          TextAnalysis.qualityScore(col("text")).as("quality"): _*)
    }),

    // Token counting: whitespace + BPE-ish regex + chars/4 heuristic.
    "text_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpeish_tokens"),
        TextAnalysis.approxTokenCount(col("text")).as("approx_tokens"))
    }),

    // Gopher-style repetition signals: duplicate-word mass and top-word
    // mass per document — the boilerplate/spam indicators a quality gate
    // thresholds on. Explode + two partial-aggregated groupBys: linear
    // per-row work, shuffles carry (doc_id, word) tuples — scales where
    // a per-row O(d²) HOF lambda would not.
    "text_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionSignals(t(s, dir, "documents"), "doc_id", "text")
    }),

    // PII redaction: plant deterministic synthetic emails/phone numbers on
    // every 5th doc (both engines synthesize the identical string — the
    // clean corpus has none naturally), then scrub with patterns from the
    // backtracking-free regex subset Java and RE2 agree on. Map-only,
    // codegen'd regexp_replace — a stateless scan stage at any scale.
    "pii_scrub" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text")).as("text"))
      planted.select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"),
            lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>")),
          lit("\\+?1-555-[0-9]{4}"), lit("<PHONE>")).as("clean"))
    }),

    // Stratified hash-mod sampling: downsample the dominant language to
    // 10%, keep minority languages at 50%, unknown whole — the training-
    // mix rebalancing step. Stateless per-row predicate (content-hash
    // bucket < per-stratum threshold): no shuffle, no per-stratum
    // window — the exact-quota alternative would sort within a handful
    // of giant language partitions at corpus scale.
    "corpus_stratified_sample" -> ((s, dir) => {
      val withLang = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang"))
      Corpus.sampleStratified(withLang, "doc_id", col("lang"),
        Seq("en" -> 10, "de" -> 50, "fr" -> 50, "es" -> 50), defaultRate = 100)
        .select(col("doc_id"), col("lang"))
    }),

    // Deterministic seeded epoch shuffle: the training order for epoch 7 —
    // a pure function of (seed, doc_id), reproducible on any cluster
    // layout; range-sort + zipWithIndex ordinal, no global window.
    "corpus_epoch_shuffle" -> ((s, dir) => {
      Corpus.epochShuffle(t(s, dir, "documents"), "doc_id", seed = 7L)
    }),

    // Weighted mixture interleaving (stride scheduling): the training
    // ORDER in which each source recurs proportionally to its weight,
    // spread evenly — here weight 1/2/3 by source number mod 3 (so the
    // schedule is non-uniform at every scale factor). Oracle replays the
    // same per-source rank + virtual-time arithmetic.
    "corpus_interleave" -> ((s, dir) => {
      val wt = lit(1.0) + (substring(col("source"), 4, 8).cast("int") % 3).cast("double")
      Corpus.interleaveByWeight(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source", wt)
        .select(col("doc_id"), col("interleave_ord"))
    }),

    // Balanced output sharding: heaviest-first round-robin deal into 8
    // output shards (the corpus write step — equal-size shards without
    // driver-side weight accounting). Deterministic total order ⇒ the
    // oracle replays the same ROW_NUMBER % 8 deal.
    "corpus_shard_balanced" -> ((s, dir) => {
      Corpus.shardBalanced(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          Seq(col("n_chars").desc, col("doc_id").asc), nShards = 8)
        .select(col("doc_id"), col("shard"))
    }),

    // Per-source (domain) cap: at most 10 docs per source, best quality
    // first — the domain-diversity guard of every web-scale corpus. The
    // k-bounded TopK Aggregator ranks (map-side combine, O(cap) state per
    // source per partition); a row_number window would funnel each heavy
    // domain onto one reducer. Oracle: the window form, equivalent for
    // finite scores.
    "corpus_source_cap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.sourceCap(docs, "source", "doc_id",
        TextAnalysis.qualityScoreFromSignals(TextAnalysis.signals(col("text"))),
        n = 10)
    }),

    // Unigram-LM cross-entropy quality signal (the KenLM-style fluency
    // proxy): vocabulary built from the corpus itself, per-doc mean of
    // -ln p(token) folded in position order for cross-engine bit
    // stability (AUDIT form — the production sum/count scale path is
    // TextAnalysis.unigramCrossEntropy, spec-proven to agree within 1e-9).
    "text_perplexity" -> ((s, dir) => {
      TextAnalysis.unigramCrossEntropyAudit(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Point-in-interval RANGE join, binned to an equi-join: clicks landing
    // inside a 10-minute window after any error spike (value > 150).
    // Spark's native plan for a pure BETWEEN predicate is
    // BroadcastNestedLoopJoin — Θ(points × intervals) at corpus scale;
    // Joins.rangeJoin quantizes both sides to binWidth-sized bins and
    // hash-joins on the bin id (spec asserts no BNLJ in the plan).
    "q_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("ts_us", Tables.tsMicros(col("ts")))
      val spikes = ev.where(col("event_type") === "error" && col("value") > 150.0)
        .select(col("event_id").as("spike_id"), col("ts_us").as("start_us"),
          (col("ts_us") + 600000000L).as("end_us"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_us").as("click_us"))
      Joins.rangeJoin(clicks, spikes, "click_us", "start_us", "end_us",
          binWidth = 600000000L)
        .select(col("spike_id"), col("click_id"), col("user_id"),
          (col("click_us") - col("start_us")).as("gap_us"))
    }),

    // Text normalization pipeline: boilerplate-line strip → Unicode NFC →
    // case fold → whitespace collapse. The documents corpus is already
    // clean lowercase ASCII, so the gate SYNTHESIZES a messy form
    // deterministically inside the query — uppercase prefix line, a
    // copyright footer, a decomposed-accent + tab + double-space tail —
    // with plain SQL both engines run, then normalizes it; every stage
    // must round-trip bit-identically through DuckDB's nfc_normalize /
    // lower / regexp_replace to pass.
    "text_normalize" -> ((s, dir) => {
      val messy = concat(
        upper(substring(col("text"), 1, 40)), lit("\n"),
        lit("Copyright 2024 ALL RIGHTS RESERVED"), lit("\n"),
        col("text"), lit("\n"),
        lit("  Cafe\u0301 \t du  Monde ")) // decomposed e + U+0301: NFC must compose
      t(s, dir, "documents")
        .select(col("doc_id"), TextNormalize.normalize(messy).as("clean"))
    }),

    // HTML boilerplate stripping: the gate stages each document inside
    // deterministic markup (head with style+script blocks, tags, escaped
    // entities — built by concat from doc_id so both engines construct the
    // IDENTICAL string), then strips it back to clean text. Codegen'd
    // regexp chain, backreference-free so RE2 (DuckDB) and java.util.regex
    // agree; per-row at the scan, no shuffle.
    "text_strip_html" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><style type=\"text/css\">p{margin:0}</style>" +
          "<script>track(\""), col("doc_id"), lit("\")</script></head>" +
          "<body><h1>Doc "), col("doc_id"), lit("</h1><p>"), col("text"),
        lit("</p><br/><a href=\"/d/"), col("doc_id"),
        lit("\">&lt;more&gt; &amp; &quot;info&quot;</a></body></html>"))
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.stripHtml(html).as("clean"))
        .withColumn("n_clean_chars", length(col("clean")))
    }),

    // Deterministic content-hash downsampling: keep ~10% of documents by
    // md5-bucket of the key — stateless per-row predicate, no shuffle, no
    // RNG state; the same document keeps the same fate however the corpus
    // is re-split. The oracle computes the identical md5-derived bucket.
    "corpus_sample_hash" -> ((s, dir) => {
      Corpus.sampleHashMod(t(s, dir, "documents"), "doc_id", 1, 10)
        .select(col("doc_id"))
    }),

    // Leakage-safe split assignment: near-dup clusters (CC over exact
    // Jaccard pairs at t>=0.8) get ONE split decided by the md5 bucket of
    // the cluster representative — near-duplicates can never straddle
    // train/test. The oracle recomputes the same clusters (recursive CTE
    // min-label flood) and the same md5 CASE.
    "corpus_split_safe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleLen = 3, threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
      Corpus.leakageSafeSplit(docs, "doc_id", pairs, "doc_a", "doc_b",
        Seq("train" -> 90, "val" -> 5, "test" -> 5))
    }),

    // Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES),
    // weight = n_chars: the "keep k docs, prefer long ones" downsample.
    // Content-keyed md5 uniform → u^(1/w) sort key (rounded to 6 dp
    // BEFORE selection so libm pow ulp wobble can't flip the cutoff);
    // plans as TakeOrderedAndProject — per-partition heaps, no global
    // sort. Oracle: the identical formula in DuckDB.
    "corpus_weighted_sample" -> ((s, dir) => {
      Corpus.weightedSample(t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars")),
        "doc_id", col("n_chars"), k = 60)
    }),

    // Sharded greedy token-budget packing: documents hash-shard 8 ways,
    // then one windowed pass per shard assigns fixed-budget bin ids —
    // parallelism = shard count, never a global single-reducer window.
    "corpus_pack_budget" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.signals(col("text")).getField("n_words").as("toks"))
      Corpus.packTokenBudget(docs, "doc_id", "toks", budget = 512L, nShards = 8)
    }),

    // Token-window chunking with overlap (RAG / long-document context-prep):
    // 64-token windows advancing by 48 (16-token overlap) — map-only
    // sequence+slice arithmetic, one output row per chunk. The oracle
    // replays the identical windowing with generate_series + list slicing.
    "corpus_chunk" -> ((s, dir) => {
      Corpus.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 64, overlap = 16)
    }),

    // End-to-end PRETOKENIZATION pipe: vocab build → corpus tokenization
    // → fixed-budget packing in ONE composed plan — the full path a
    // pretraining data job runs before writing shards. Token counts come
    // from the tokenize stage's per-doc aggregation (single-space
    // convention), so the oracle replays len(string_split) + the same
    // md5-shard greedy window as corpus_pack_budget — any drift in the
    // vocab ranking, the broadcast join, or the re-assembly that changes
    // a document's token count breaks the hash.
    "pipe_pretokenize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = Corpus.buildVocab(docs, "text", minCount = 2L)
      val toks = Corpus.tokenizeToIds(docs, "doc_id", "text", vocab)
      Corpus.packTokenBudget(
        toks.select(col("doc_id"), col("n_tokens")), "doc_id", "n_tokens",
        budget = 512L, nShards = 8)
    }),

    // Per-(doc, term) TF-IDF (keyword extraction / lexical retrieval
    // weight): integer tf & df aggregation, one equi-join against the
    // Zipf-bounded term table, broadcast scalar N — the only floating
    // step is the final tf·ln(N/df). minTf=2 drops the hapax tail before
    // the join (the scale dial, engaged here and mirrored by HAVING).
    "text_tfidf" -> ((s, dir) => {
      TextAnalysis.tfIdf(t(s, dir, "documents"), "doc_id", "text", minTf = 2L)
    }),

    // Keyword extraction — top-3 TF-IDF terms per document (the RAG
    // metadata / search-facet step downstream of text_tfidf): per-doc
    // window rank (partitioned by doc — parallel across docs, never
    // global), ties by term for engine determinism. The tfidf doubles
    // are already proven bit-equal cross-engine by text_tfidf's hash, so
    // ranking on them is safe.
    "text_keywords" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tfidf = TextAnalysis.tfIdf(t(s, dir, "documents"), "doc_id", "text", minTf = 2L)
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term").asc)
      tfidf.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("rank"))
    }),

    // Vocabulary build (the step before any tokenizer/embedding-table
    // training): corpus term counts → deterministic ids by (count DESC,
    // term ASC) rank, hapax-filtered. Ranking is a range-partitioned sort
    // + per-partition ordinal offsets (Joins.zipWithOrdinal) — NOT a
    // no-partition row_number window, which would funnel the whole vocab
    // (billions of cnt>=2 typos/URLs at crawl scale) through one reducer.
    // The only corpus-sized work is the one partial-aggregated count.
    "corpus_vocab" -> ((s, dir) => {
      graft.functions.Corpus.buildVocab(t(s, dir, "documents"), "text", minCount = 2L)
    }),

    // Corpus tokenization against the built vocabulary — the missing step
    // between vocab build and packing/chunking: per-doc ORDERED token-id
    // sequence, OOV → reserved id 0. One broadcast join (a vocabulary is
    // tokenizer-budget-bounded, never corpus-sized); the per-doc collect
    // is bounded by one document's length. token_ids is serialized to a
    // comma-joined string for the gate only (the driver's pandas row-sort
    // cannot order array cells — the q_collect_list precedent); the
    // operator itself emits a real array<long>.
    "corpus_tokenize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = graft.functions.Corpus.buildVocab(docs, "text", minCount = 2L)
      graft.functions.Corpus.tokenizeToIds(docs, "doc_id", "text", vocab)
        .select(col("doc_id"), col("n_tokens"),
          array_join(col("token_ids").cast("array<string>"), ",").as("token_ids"))
    }),

    // Bigram-LM cross-entropy (conditional fluency proxy) — the AUDIT
    // (position-ordered fold) form, hashable cross-engine; the sum/count
    // scale form is TextAnalysis.bigramCrossEntropy, spec-proven to
    // agree within 1e-9 (same split as text_perplexity).
    "text_bigram_xent" -> ((s, dir) => {
      TextAnalysis.bigramCrossEntropyAudit(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Misra–Gries heavy hitters — differential gate: MG counter values are
    // arrival-order-dependent (any run under-counts by ≤ n/(k+1)), but
    // MEMBERSHIP of every true heavy hitter (freq > n/(k+1)) is
    // GUARANTEED under any partitioning (mergeable-summaries bound). The
    // gate computes exact counts for the true heavy hitters (integer SQL,
    // hashable) and probes each against the k=63-counter sketch — a
    // broken reduce/merge drops a guaranteed member and flips a boolean.
    "text_heavy_hitters" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
      val mg = udaf(graft.functions.HeavyHitters.misraGries(63))
      val sketch = toks.agg(mg(col("term")).as("sketch"))
      val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      // total tokens = sum of the per-term counts — derived from `exact`
      // instead of a third corpus scan + explode
      val total = exact.agg(sum(col("cnt")).as("n"))
      exact.crossJoin(broadcast(total))
        .where(col("cnt") * 64 > col("n")) // integer-exact threshold
        .crossJoin(broadcast(sketch))
        .select(col("term"), col("cnt"),
          array_contains(col("sketch"), col("term")).as("in_sketch"))
    }),

    // Benchmark decontamination: distinct 8-gram overlap between every
    // train doc and the eval split. The eval split is a FIXED id range
    // (doc_id < 40) — a benchmark suite is a fixed-size artifact, and the
    // bounded split is what makes Dedup.contamination's broadcast side
    // constant under corpus growth (a %-of-corpus split would grow the
    // broadcast linearly and eventually OOM the driver). The clean
    // synthetic corpus shares few long n-grams naturally, so a
    // contaminating sentence is PLANTED deterministically into the eval
    // split and a disjoint slice of train docs (both engines synthesize
    // the identical string — same trick as pii_scrub/dedup_normalized),
    // guaranteeing the gate compares non-empty results at every scale
    // factor.
    "text_decontaminate" -> ((s, dir) => {
      Dedup.contamination(seededDocs(t(s, dir, "documents")), "doc_id", "text",
        col("doc_id") < 40, shingleLen = 8)
    }),

    // Bloom-pruned decontamination — the scale path for an eval-gram set
    // too big to broadcast exactly: scan-side might_contain(xxhash64(gram))
    // prune, then the exact join removes the false positives, so the
    // result is BIT-IDENTICAL to text_decontaminate and shares its oracle
    // string (any divergence = a false negative, which Bloom cannot have).
    "text_decontaminate_bloom" -> ((s, dir) => {
      Dedup.contaminationBloom(seededDocs(t(s, dir, "documents")), "doc_id",
        "text", col("doc_id") < 40, shingleLen = 8)
    }),

    // Training-mix resampling weights: per-source token share and the
    // multiplier that rebalances to a uniform mix (weight > 1 ⇒ upsample).
    // One partial-aggregated groupBy over the corpus; the window runs over
    // the AGGREGATED per-source rows (a handful), not the data. Every
    // double op mirrors the oracle op-for-op (exact long sums, one cast,
    // one divide) so the ratios are IEEE-identical.
    "corpus_mix_weights" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, dir, "documents").select(col("source"),
        TextAnalysis.signals(col("text")).getField("n_words").cast("long").as("toks"))
      val agg = toks.groupBy(col("source")).agg(sum(col("toks")).as("toks"))
      val w = Window.partitionBy()
      val share = col("toks").cast("double") / sum(col("toks")).over(w).cast("double")
      agg.select(col("source"), col("toks"), share.as("share"),
        ((lit(1.0) / count(lit(1)).over(w)) / share).as("weight"))
    }),

    // Token-rarity quality signal: per doc, the mean DOCUMENT FREQUENCY of
    // its tokens — low values flag gibberish/rare-vocab docs, high values
    // boilerplate (the distribution-tail filter that complements stopword
    // ratios). Two aggregations over the exploded token stream (vocab df,
    // then per-doc mean) — both partial-aggregated, shuffles carry
    // (token)/(doc_id) keys only. All-integer until one final division,
    // so the ratio is IEEE-identical cross-engine.
    "text_rarity" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val dfreq = toks.distinct()
        .groupBy(col("w")).agg(count(lit(1)).as("df"))
      toks.join(dfreq, "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("df")).as("df_sum"))
        .select(col("doc_id"), col("n_tokens"),
          (col("df_sum").cast("double") / col("n_tokens").cast("double")).as("mean_df"))
    }),

    // Language-audit: docs whose DECLARED lang disagrees with the n-gram
    // detector (the metadata-vs-content consistency check run before
    // language-stratified sampling trusts either). Map-only scan — the
    // fused text_signals pass feeds the detector, no second traversal.
    "text_lang_mismatch" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("declared"),
          TextAnalysis.langIdFromSignals(
            TextAnalysis.signals(col("text"))).as("pred_lang"))
        .where(col("pred_lang") =!= col("declared"))
    }),

    // Winnowing fingerprints (xxhash64-based: rows-only + spec).
    // Differential gate (r8): xxhash64 keeps the VALUES out of DuckDB's
    // reach, but winnowing has two independent Spark formulations — the
    // production codegen'd array form (slice + array_min per window) and a
    // window-function form (posexplode + min over rowsBetween, with the
    // same short-document fallback). Set equality between them is the
    // checkable invariant (the raw fingerprint counts stay spec-covered).
    "text_fingerprint" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val prod = docs.select(col("doc_id"),
        sort_array(TextAnalysis.fingerprints(col("text"))).as("fps"))
      val windowLen = 4
      val hashes = transform(graft.functions.TextOps.shingles(col("text"), 5),
        sh => xxhash64(sh))
      val ex = docs.select(col("doc_id"), posexplode(hashes).as(Seq("pos", "h")))
      val slide = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.currentRow, windowLen - 1)
      val whole = Window.partitionBy(col("doc_id"))
      val alt = ex
        .withColumn("n", count(lit(1)).over(whole))
        .withColumn("m", min(col("h")).over(slide))
        // full windows only — except the short-doc fallback (n < window):
        // keep pos 0, whose rowsBetween min spans the whole doc
        .where(col("pos") <= greatest(col("n") - windowLen, lit(0)))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("m"))).as("fps_alt"))
      prod.join(alt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("fps") === col("fps_alt"),
            size(col("fps")) === 0).as("forms_agree"))
    }),

    // Multimodal plumbing: binary payload -> typed mapPartitions decode
    // stage (decode itself stubbed deterministically; see Multimodal).
    "mm_meta" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.encodeAsBinary(t(s, dir, "documents"), "doc_id", "text")
        .as[Multimodal.MediaRecord]
      Multimodal.extractMeta(media).toDF()
        .select("doc_id", "byte_len", "magic", "n_frames", "format")
    }),

    // Multimodal REAL decode: text bytes encoded as genuine RIFF/WAVE PCM16
    // payloads (real 44-byte header + data chunk), then decoded by the
    // pure-JVM WAV parser — sample rate / channels / bit depth / sample
    // count all recovered from the actual bytes, oracle-checked (the
    // encoder's geometry is a closed form over the text length).
    "mm_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.encodeAsBinary(t(s, dir, "documents"), "doc_id", "text")
        .as[Multimodal.MediaRecord]
      val wavs = media.mapPartitions(_.map(r =>
        Multimodal.MediaRecord(r.doc_id, Multimodal.encodeWavPcm16(r.media), "wav")))
      Multimodal.decodeWavMeta(wavs).toDF()
        .select("doc_id", "sample_rate", "channels", "bits_per_sample", "n_samples")
    }),

    // Multimodal framing: sample-accurate WAV frame extraction through the
    // typed mapPartitions stage, aggregated per document. The PCM16
    // encoder's geometry is a closed form over the text byte length
    // (1 byte → 1 sample → 2 data bytes; 25-sample frames, last frame
    // partial), so frame counts and byte totals are SQL-oracle-able.
    "mm_wav_frames" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.encodeAsBinary(t(s, dir, "documents"), "doc_id", "text")
        .as[Multimodal.MediaRecord]
      val wavs = media.mapPartitions(_.map(r =>
        Multimodal.MediaRecord(r.doc_id, Multimodal.encodeWavPcm16(r.media), "wav")))
      Multimodal.wavFrames(wavs, frameSamples = 25).toDF()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame"))).as("frame_bytes"))
    }),

    // Multimodal REAL PNG round-trip (round-7 verdict #5): deterministic
    // gray images (geometry and color closed-form in doc_id) are encoded
    // through the JDK's real PNG codec, then decoded back to a raster by
    // the typed mapPartitions stage. mean_red is a CONTENT statistic: PNG
    // is lossless, so the uniform fill must survive zlib round-trip
    // exactly — the oracle is pure closed-form geometry.
    // Multimodal INGESTION from a file store — Spark's built-in
    // `binaryFile` source, the actual path a 100 TB image corpus arrives
    // through (each object = one row with path/length/content; the source
    // parallelizes across files and pushes a pathGlobFilter). The gate
    // stages deterministic PNGs (gate staging, like s10's files), reads
    // them back through binaryFile, recovers the id from the PATH, and
    // runs the real decode stage — oracle is the same closed-form
    // geometry as mm_png_decode over the staged id range.
    "src_binaryfile_media" -> ((s, dir) => {
      import s.implicits._
      val media = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.png").load(binaryFileStage)
        .select(
          regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
            .cast("long").as("doc_id"),
          col("content"))
        .as[(Long, Array[Byte])]
        .map { case (id, bytes) => Multimodal.MediaRecord(id, bytes, "png") }
      Multimodal.decodeImageMeta(media).toDF()
        .select("doc_id", "width", "height", "n_pixels", "mean_red")
    }),

    // Hive-style PARTITIONED layout — the other storage lever (with
    // bucketing) of the 100 TB posture: events staged once per JVM
    // partitioned by event_type, then read back with a partition-key
    // filter. The filter prunes at the directory LISTING (LayoutSpec
    // asserts the scan lists exactly one of the five partitions — a 100 TB
    // date-partitioned log reads one day, not the archive). Layout is
    // result-invariant ⇒ the oracle is the plain filter SQL.
    "src_partitioned_scan" -> ((s, dir) => {
      val stage = stagedFeed(s"partlay#$dir", "graft-partlay") { st =>
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
          .write.mode("overwrite").partitionBy("event_type").parquet(st)
      }
      s.read.parquet(stage).where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
    }),

    "mm_png_decode" -> ((s, dir) => {
      import s.implicits._
      val imgs = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          Multimodal.MediaRecord(id, Multimodal.grayTestImage(id, "png"), "png")))
      Multimodal.decodeImageMeta(imgs).toDF()
        .select("doc_id", "width", "height", "n_pixels", "mean_red")
    }),

    // Same round-trip through the REAL JPEG codec (DCT, lossy): geometry
    // is exact; the uniform gray fill must come back within a small DC
    // quantization tolerance — emitted as a boolean so the oracle stays
    // deterministic.
    // Real raster RESIZE (decode → halve via Graphics2D → re-encode PNG →
    // re-decode): the mm transform stage, not just ingestion. The emitted
    // stats come from the RESIZED bytes, so the oracle's closed-form
    // geometry (floor-halved dims) and uniform-gray mean prove the whole
    // transform round trip.
    "mm_image_resize" -> ((s, dir) => {
      import s.implicits._
      val imgs = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          Multimodal.MediaRecord(id, Multimodal.grayTestImage(id, "png"), "png")))
      Multimodal.resizeHalfMeta(imgs).toDF()
        .select("doc_id", "width", "height", "n_pixels", "mean_red")
    }),

    "mm_jpeg_decode" -> ((s, dir) => {
      import s.implicits._
      val imgs = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          Multimodal.MediaRecord(id, Multimodal.grayTestImage(id, "jpg"), "jpg")))
      Multimodal.decodeImageMeta(imgs).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
          (abs(col("mean_red") - (col("doc_id") % 256)) <= 3.0).as("red_close"))
    }),

    // Temperature-scaled source rebalancing (alpha = 0.5): per-source keep
    // rate (n_min/n_i)^0.5 via integer hash thresholds — smallest source
    // kept whole, larger ones downsampled toward uniform. alpha = 0.5 is
    // the bit-exact path (IEEE sqrt is correctly rounded in both engines;
    // see Corpus.temperatureSample). Corpus side is a stateless hash
    // predicate behind one tiny broadcast-joined threshold table.
    // The synthetic sources are EXACTLY uniform (rate 1 everywhere —
    // vacuous), so the gate tiers them 12/6/2 into big/mid/small strata
    // first: proportions are scale-invariant, so the downsampling engages
    // (sqrt(1/6) for big, sqrt(1/3) for mid) at every scale factor.
    "corpus_temperature_sample" -> ((s, dir) => {
      val srcNum = substring(col("source"), 4, 8).cast("int")
      val tiered = t(s, dir, "documents").withColumn("tier",
        when(srcNum < 12, lit("big"))
          .when(srcNum < 18, lit("mid"))
          .otherwise(lit("small")))
      Corpus.temperatureSample(tiered, "doc_id", "tier", alpha = 0.5)
        .select(col("doc_id"), col("tier"))
    }),

    // HLL sketch distinct-count (Apache DataSketches via hll_sketch_agg —
    // the built-in mergeable-sketch surface). Items are per-token unique
    // ids (doc_id#pos), so the true distinct count per language is the
    // token count — cheap for the oracle — while the sketch runs in real
    // estimation territory (tens of thousands of uniques per group at
    // sf0.01). Two differential invariants, both deterministic (HLL
    // registers are order-invariant maxes): the direct estimate lands
    // within ±10% of exact (lgK=12 → RSE 1.6%, so 10% is >6 sigma), and a
    // two-level merge — per-source sketches hll_union_agg'd per language —
    // estimates within the SAME bound (shard-combinability at 100 TB).
    // The merged estimate is NOT asserted bit-equal to the direct one:
    // union normalizes to dense HLL mode, while a small direct sketch can
    // still be in exact sparse mode — the accuracy contract survives the
    // merge, the representation doesn't.
    "q_hll_distinct" -> ((s, dir) => {
      val items = t(s, dir, "documents")
        .select(col("lang"), col("source"), col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
        .select(col("lang"), col("source"),
          concat_ws("#", col("doc_id"), col("pos")).as("item"))
      val direct = items.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_exact"),
          hll_sketch_estimate(hll_sketch_agg(col("item"), 12)).as("est"))
      val merged = items.groupBy(col("lang"), col("source"))
        .agg(hll_sketch_agg(col("item"), 12).as("sk"))
        .groupBy(col("lang"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_m"))
      direct.join(merged, Seq("lang"))
        .select(col("lang"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.10)
            .as("est_ok"),
          (abs(col("est_m") - col("n_exact")) <= col("n_exact") * 0.10)
            .as("merge_ok"))
    }),

    // Count-Min sketch: depth x width counter matrix, merged by
    // element-wise addition (constant-size map-side combine vs the exact
    // count's full Zipf-tail shuffle). The gate probes EVERY distinct term
    // against the sketch and hash-checks two invariants the oracle states
    // as constants: estimate >= exact (one-sided, guaranteed — counters
    // only add), and the overestimate stays under 4n/width (integer-exact
    // comparison; expected excess is n/width per row, the min over 4 rows
    // sits far below the 4x ceiling for any fixed hash family).
    "text_count_min" -> ((s, dir) => {
      val depth = 4; val width = 1024
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
      val cms = udaf(graft.functions.CountMin.countMin(depth, width))
      val sketch = toks.agg(cms(col("term")).as("sketch"))
      val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val total = exact.agg(sum(col("cnt")).as("n"))
      exact.crossJoin(broadcast(total)).crossJoin(broadcast(sketch))
        .select(col("term"), col("cnt"),
          graft.functions.CountMin.estimateColumn(
            col("sketch"), col("term"), depth, width).as("e"), col("n"))
        .select(col("term"), col("cnt"),
          (col("e") >= col("cnt")).as("ge_ok"),
          ((col("e") - col("cnt")) * width <= col("n") * 4).as("within_ok"))
    }),

    // C4-style line-level cleaning (Raffel et al. 2020 §2.2). The corpus
    // is word soup with no line structure, so the gate STAGES it
    // deterministically in both engines (the text_normalize /
    // pii_scrub trick): tokens are cut into 6-word lines, ~70% of lines
    // get a terminal '.' by content hash, and hash-picked docs get a
    // "lorem ipsum" line (1/17) or a curly-brace line (1/13) appended.
    // c4Clean then keeps punctuation-terminated lines of >= 5 words and
    // drops lorem/brace docs and docs with < 3 surviving lines — both
    // drop directions non-vacuous at every scale factor.
    "text_c4_clean" -> ((s, dir) =>
      TextAnalysis.c4Clean(c4StagedDocs(t(s, dir, "documents")), "doc_id",
        "text", minWordsPerLine = 5, minLines = 3)),

    // Streaming twin of text_c4_clean (the s11_stream_chunk construction):
    // the staging and every C4 rule are stateless per-row expressions, so
    // the SAME operator code runs over readStream micro-batches and must
    // converge to exactly the batch answer — one oracle serves both.
    "s13_stream_c4_clean" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = t(ss, dir, "documents").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val cleaned = TextAnalysis.c4Clean(c4StagedDocs(src), "doc_id",
        "text", minWordsPerLine = 5, minLines = 3)
      val sink = "s13_stream_c4_sink"
      val q = cleaned.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // Gopher document-quality rules (Rae et al. 2021, "Scaling Language
    // Models: ... Gopher", table A1): word-count range, mean-word-length
    // range, >=80% words with an alphabetic character (integer-exact
    // 5*alpha >= 4*n comparison), >=2 stopwords. Emitted as per-doc rule
    // booleans + the composite verdict (not pre-filtered), so the oracle
    // hash-checks BOTH directions of every rule. Map-only fused scan.
    "text_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(t(s, dir, "documents"), "doc_id", "text",
        minWords = 50, maxWords = 100000)),

    // Within-doc duplicate-line repetition — the line-level complement of
    // text_repetition (the Gopher/MassiveText repetition battery measures
    // both). The word-soup corpus has no line structure and 6-word lines
    // essentially never collide by chance, so the staging PLANTS
    // repetition deterministically: 6-word lines, then the doc's first
    // line re-appended k = md5%4 times (k=0 keeps the no-repetition
    // direction non-vacuous). The oracle replays staging + grouped
    // counts verbatim; fractions are one int→double division each.
    "text_dup_lines" -> ((s, dir) =>
      TextAnalysis.duplicateLineSignals(repStagedDocs(t(s, dir, "documents")),
        "doc_id", "text")),

    // Top n-gram character coverage (n = 2 and 3) — the remaining Gopher
    // repetition signal: the most frequent word n-gram per doc (smallest
    // gram wins count ties, so both engines agree) and the char fraction
    // its occurrences cover. Arg-max is the min(struct(-cnt, gram))
    // partial aggregate — one candidate per doc per partition, no window
    // over the data; the oracle reaches the same row via a per-doc
    // row_number (method-independent answer).
    "text_ngram_coverage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.topNgramCoverage(docs, "doc_id", "text", 2)
        .unionByName(TextAnalysis.topNgramCoverage(docs, "doc_id", "text", 3))
    }),

    // Watermark-bounded streaming dedup (dropDuplicatesWithinWatermark) —
    // the at-least-once-source dedup: unlike s7's dropDuplicates, state
    // for a key EXPIRES once the watermark passes, so state is bounded by
    // the delay window instead of growing forever. Keys are
    // (user_id, event_type, hour): every duplicate of a key sits within
    // the 1-hour bucket < the 2-hour delay, so the API's guarantee makes
    // the result exactly SELECT DISTINCT regardless of arrival order —
    // deterministic, batch-oracle-able.
    "s14_stream_dedup_watermark" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = t(ss, dir, "events").schema
      val src = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val dedup = src
        .select(col("user_id"), col("event_type"),
          date_trunc("hour", Tables.tsFromNanos(col("ts"))).as("hr"))
        .withWatermark("hr", "2 hours")
        .dropDuplicatesWithinWatermark("user_id", "event_type", "hr")
      val sink = "s14_stream_dedup_wm_sink"
      val q = dedup.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink)
    }),

    // DSIR importance log-weights (Xie et al. 2023): hashed unigram+bigram
    // log-likelihood ratio of the trusted-source target distribution
    // (source = 'src0') vs the raw corpus — the data-selection score a
    // pretraining pipeline resamples by. Bucket table is 1024 rows
    // regardless of corpus size; totals ride a broadcast single-row agg;
    // per-doc sums are partial-aggregated. Every double op (integer-exact
    // products, one divide, one ln per bucket) mirrors the oracle.
    "corpus_dsir_weights" -> ((s, dir) =>
      Corpus.dsirLogWeights(t(s, dir, "documents"), "doc_id", "text",
        col("source") === "src0", buckets = 1024)),

    // §2.7 extension — grouped aggregation (TPC-H Q1 shape). The reference
    // has no aggregates (SURVEY.md §2.7); Catalyst supplies partial+final
    // hash aggregation. Money math accumulates EXACT INTEGER CENTS in
    // long (pure codegen'd long arithmetic — no per-row Decimal objects,
    // which made the decimal(18,2)-sum form 3× slower). Every per-row
    // value is a whole number of cents (floor(x*100+0.5) recovers it
    // exactly from the stored double — inputs are non-negative, so this
    // is round-half-up).
    //
    // Bit-parity with the oracle's CAST(SUM(decimal) AS DOUBLE) holds at
    // ANY scale (r4 advice #5): the exact long sums are widened to
    // decimal, scaled down by the power of ten IN DECIMAL (exact — the
    // result scale ≥ the needed 2/4 digits), and cast to double once per
    // GROUP — the same single correctly-rounded conversion the oracle
    // performs. The previous form cast the long sum to double BEFORE
    // dividing, which is exact only while the sum stays under 2^53
    // (≈ sf 10 for sum_disc_price). The disc-price product (≤ ~1e9 per
    // row) is further split into (quotient, remainder) by 10^4 — two long
    // sums, each bounded by rows/group × 1e5, recombined exactly in
    // per-group decimal math — so long accumulation itself holds to
    // ~9e13 rows per group (≈ petabytes of lineitem), not 9e9.
    "q1_agg" -> ((s, dir) => {
      val cents = (c: org.apache.spark.sql.Column) =>
        floor(c * 100.0 + 0.5).cast("long")
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          cents(col("l_quantity")).as("qty_c"),
          cents(col("l_extendedprice")).as("ep_c"),
          cents(col("l_discount")).as("disc_c"))
        .withColumn("dp", col("ep_c") * (lit(100L) - col("disc_c")))
        .withColumn("dp_hi", expr("dp DIV 10000"))
        .withColumn("dp_lo", col("dp") - col("dp_hi") * lit(10000L))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (dec(sum(col("qty_c"))) / lit(100)).cast("double").as("sum_qty"),
          (dec(sum(col("ep_c"))) / lit(100)).cast("double").as("sum_base_price"),
          ((dec(sum(col("dp_hi"))) * lit(10000) + dec(sum(col("dp_lo")))) / lit(10000))
            .cast("double").as("sum_disc_price"),
          ((dec(sum(col("qty_c"))) / lit(100)).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Transitive closure over the planted 3-hop chain, ONE SQL text for
    * both engines (Spark 4 and DuckDB both run `WITH RECURSIVE`; only
    * the table name differs). Acyclic per-id path ⇒ UNION ALL recursion
    * terminates with each reachable pair exactly once. */
  private def recursiveClosureSql(table: String): String =
    s"""WITH RECURSIVE e AS (
           SELECT doc_id AS src, doc_id + 100000 AS dst FROM $table WHERE doc_id < 50
           UNION ALL
           SELECT doc_id + 100000, doc_id + 200000 FROM $table WHERE doc_id < 50
           UNION ALL
           SELECT doc_id + 200000, doc_id + 300000 FROM $table WHERE doc_id < 50),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION ALL
           SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src)
       SELECT src, dst FROM reach"""

  /** Chunk-windowing oracle (64-token windows, stride 48) — shared by
    * `corpus_chunk` and `s11_stream_chunk` (the streaming twin must
    * converge to exactly the batch answer, so one SQL serves both; a
    * geometry change edits ONE place). */
  private val chunkOracleSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            c AS (SELECT doc_id, toks,
                         CASE WHEN len(toks) <= 64 THEN 1
                              ELSE CAST(ceil((len(toks) - 16) / 48.0) AS INT)
                         END AS nc
                  FROM t),
            x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)
       SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
              CAST(i * 48 AS BIGINT) AS start_token,
              CAST(len(toks[i*48+1 : i*48+64]) AS BIGINT) AS n_chunk_tokens,
              array_to_string(toks[i*48+1 : i*48+64], ' ') AS chunk_text
       FROM x"""

  /** DuckDB replay of [[c4StagedDocs]] + the C4 rules — ONE string for
    * `text_c4_clean` and `s13_stream_c4_clean` (the streaming twin must
    * converge to exactly the batch answer; a rule change edits one place,
    * the `corpus_chunk` precedent). */
  private val c4CleanOracleSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            c AS (SELECT doc_id, toks,
                         CAST(ceil(len(toks) / 6.0) AS INT) AS nl FROM t),
            x AS (SELECT doc_id, toks, unnest(range(0, nl)) AS i FROM c),
            ln AS (SELECT doc_id, i,
                     array_to_string(toks[i*6+1 : i*6+6], ' ') ||
                     CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(i AS VARCHAR)), 1, 8))::UBIGINT % 10 < 7
                          THEN '.' ELSE '' END AS line
                   FROM x),
            stage AS (SELECT doc_id,
                        string_agg(line, chr(10) ORDER BY i) ||
                        CASE WHEN ('0x' || substr(md5('lorem#' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 17 = 0
                             THEN chr(10) || 'lorem ipsum dolor sit amet consectetur adipiscing elit.' ELSE '' END ||
                        CASE WHEN ('0x' || substr(md5('brace#' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 13 = 0
                             THEN chr(10) || 'window.config = { template: true };' ELSE '' END AS text
                      FROM ln GROUP BY doc_id),
            k AS (SELECT doc_id, text,
                    list_filter(string_split(text, chr(10)),
                      l -> regexp_matches(l, '[.!?"]$') AND len(string_split(l, ' ')) >= 5) AS kept
                  FROM stage)
       SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
              CAST(len(kept) AS BIGINT) AS n_lines_kept,
              CAST(len(string_split(text, chr(10))) - len(kept) AS BIGINT) AS n_lines_dropped
       FROM k
       WHERE NOT (contains(lower(text), 'lorem ipsum') OR contains(text, '{'))
         AND len(kept) >= 3"""

  /** Deterministic line-structure staging for the C4-clean gates (shared
    * by `text_c4_clean` and its streaming twin `s13_stream_c4_clean`): the
    * word-soup corpus has no line structure, so tokens are cut into 6-word
    * lines, ~70% get a terminal '.' by content hash, and hash-picked docs
    * get a lorem-ipsum line (1/17) or a curly-brace line (1/13) appended —
    * all stateless per-row expressions (streaming-safe), mirrored
    * op-for-op in [[c4CleanOracleSql]]. */
  private def c4StagedDocs(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nLines = ceil(size(toks) / 6.0).cast("int")
    val lines = transform(sequence(lit(0), nLines - 1), i =>
      concat(array_join(slice(toks, i * 6 + 1, lit(6)), " "),
        when(Corpus.hashBucket(
          concat_ws("#", col("doc_id"), i.cast("string")), 10) < 7,
          lit(".")).otherwise(lit(""))))
    docs.select(col("doc_id"),
      concat(array_join(lines, "\n"),
        when(Corpus.hashBucket(concat(lit("lorem#"),
          col("doc_id").cast("string")), 17) === 0,
          lit("\nlorem ipsum dolor sit amet consectetur adipiscing elit."))
          .otherwise(lit("")),
        when(Corpus.hashBucket(concat(lit("brace#"),
          col("doc_id").cast("string")), 13) === 0,
          lit("\nwindow.config = { template: true };"))
          .otherwise(lit(""))).as("text"))
  }

  /** DuckDB replay of the planted-contamination pipeline — ONE string for
    * `text_decontaminate` and `text_decontaminate_bloom` (the Bloom prune
    * is result-invariant, so both gates must hash to the same answer). */
  private val decontaminateOracleSql =
    """WITH seeded AS (
         SELECT doc_id,
                CASE WHEN doc_id < 40 OR doc_id % 10 = 3
                     THEN text || ' the quick brown fox jumps over the lazy dog tonight'
                     ELSE text END AS text
         FROM documents),
         s AS (SELECT doc_id, string_split(text, ' ') AS w FROM seeded),
         t AS (SELECT doc_id,
                      list_distinct([ w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
                                      w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]
                                      for i in range(1, len(w)-6) ]) AS sh
               FROM s WHERE len(w) >= 8),
         ev AS (SELECT DISTINCT unnest(sh) AS g FROM t WHERE doc_id < 40),
         tr AS (SELECT doc_id, unnest(sh) AS g FROM t WHERE doc_id >= 40)
       SELECT tr.doc_id AS doc_id, COUNT(DISTINCT tr.g) AS n_hits
       FROM tr JOIN ev ON tr.g = ev.g
       GROUP BY tr.doc_id"""

  /** Deterministic line staging WITH PLANTED REPETITION for
    * `text_dup_lines`: 6-word lines (no punctuation needed here), then
    * the document's first line is re-appended k = md5-hash%4 ∈ {0,1,2,3}
    * times, so duplicate-line counts span 0–3 and both directions of the
    * repetition signal are exercised. Stateless per-row expressions,
    * mirrored op-for-op by the oracle's `repeat(chr(10) || line0, k)`. */
  private def repStagedDocs(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nLines = ceil(size(toks) / 6.0).cast("int")
    val lines = transform(sequence(lit(0), nLines - 1), i =>
      array_join(slice(toks, i * 6 + 1, lit(6)), " "))
    val line0 = array_join(slice(toks, 1, 6), " ")
    val k = Corpus.hashBucket(concat(lit("dup#"),
      col("doc_id").cast("string")), 4)
    docs.select(col("doc_id"),
      concat(array_join(lines, "\n"),
        when(k >= 1, concat(lit("\n"), line0)).otherwise(lit("")),
        when(k >= 2, concat(lit("\n"), line0)).otherwise(lit("")),
        when(k >= 3, concat(lit("\n"), line0)).otherwise(lit("")))
        .as("text"))
  }

  /** Brute-force cosine top-k oracle — shared by `sim_brute_topk` and
    * `sim_ivf_exhaustive` (IVF probing every cell IS exhaustive search). */
  private val bruteTopkSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT * FROM e WHERE vec_id < 10),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     CASE WHEN list_dot_product(q.v, q.v) = 0
                            OR list_dot_product(c.v, c.v) = 0 THEN NULL
                          ELSE list_dot_product(q.v, c.v) /
                               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
                     END AS s
              FROM q JOIN e c ON q.vec_id <> c.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id, s,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rank
              FROM scored WHERE s IS NOT NULL)
       SELECT query_id, neighbor_id, s AS score, CAST(rank AS INT) AS rank
       FROM ranked WHERE rank <= 5"""

  /** Full SQL replication of `Similarity.lshTopK(k=5, nPlanes=6)`: the
    * seeded hyperplanes are deterministic, so their exact values are
    * interpolated as DOUBLE[] literals (java.lang.Double.toString
    * round-trips every double) and the sign bucket is recomputed in
    * DuckDB — bucket bits agree because both engines produce bit-identical
    * left-to-right double dot products (proven by sim_brute_topk's hash). */
  private val lshTopkSql: String = {
    val planes = Similarity.hyperplanes(nPlanes = 6, dim = 64, seed = 42L)
    val bucket = planes.zipWithIndex.map { case (p, j) =>
      val arr = p.map(java.lang.Double.toString).mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(v, $arr) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            b AS (SELECT vec_id, v, $bucket AS bucket FROM e),
            q AS (SELECT * FROM b WHERE vec_id < 10),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     CASE WHEN list_dot_product(q.v, q.v) = 0
                            OR list_dot_product(c.v, c.v) = 0 THEN NULL
                          ELSE list_dot_product(q.v, c.v) /
                               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
                     END AS s
              FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id, s,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rank
              FROM scored WHERE s IS NOT NULL)
       SELECT query_id, neighbor_id, s AS score, CAST(rank AS INT) AS rank
       FROM ranked WHERE rank <= 5"""
  }

  def oracleSql: Map[String, String] = Map(
    "s1_scan_pushdown" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
         WHERE l_quantity >= 30.0 AND l_returnflag = 'A'""",
    "p_dsl_range_sort_page" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity >= 10.0 AND l_quantity <= 15.0
         ORDER BY l_orderkey, l_linenumber LIMIT 100 OFFSET 5""",
    "p_dsl_bool_ops" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice FROM orders
         WHERE (o_orderstatus <> 'F' AND o_orderpriority IN ('1-URGENT','2-HIGH'))
            OR (o_totalprice > 400000.0 AND o_orderpriority NOT IN ('5-LOW'))""",
    "j1_join_inner" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, l_partkey,
                l_quantity,
                CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                     AS DOUBLE) AS net_price
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderstatus = 'O'""",
    "s3_eventlog_offset" ->
      """SELECT user_id, event_id, CAST(FLOOR(event_id / 256) AS BIGINT) AS partition_nr,
                event_type, value
         FROM events WHERE user_id = 7 AND event_id >= 100 ORDER BY event_id""",
    "p11_mql_channel" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
         WHERE l_quantity >= 45 OR (l_returnflag IN ('A') AND l_quantity < 5)
         ORDER BY l_orderkey, l_linenumber LIMIT 500 OFFSET 3""",
    // $exists ⇒ IS [NOT] NULL, $not ⇒ three-valued NOT (see the gate)
    "p17_mql_not_exists" ->
      """WITH d AS (SELECT doc_id,
                           CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang_opt,
                           n_chars
                    FROM documents)
         SELECT doc_id, lang_opt, n_chars FROM d
         WHERE lang_opt IS NULL
            OR (lang_opt IS NOT NULL AND NOT (n_chars < 600))""",
    "q_sql_direct" ->
      """SELECT n_name, COUNT(*) AS n_suppliers,
                CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""",
    "s2_scan_raw" ->
      """SELECT event_id, event_type, value FROM events
         WHERE event_type IN ('click','view') AND value > 50""",
    // identical SQL text, DuckDB table name
    "q_recursive_cte" -> recursiveClosureSql("documents"),
    "q_correlated_exists" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_quantity >= 49.0)
           AND NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_orderkey = o.o_orderkey
                             AND l.l_returnflag = 'R')""",
    "p_dynamic_json" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INT) AS k,
                json_extract_string(props, '$.missing_field') AS missing_field
         FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50""",
    "p12_column" ->
      "SELECT p_name FROM part",
    "p13_as_typed" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_totalprice > 300000.0""",
    "p6_all_array" ->
      """SELECT doc_id FROM documents
         WHERE list_has_all(string_split(text, ' '), ['scan', 'column'])""",
    "p10_fk_param" ->
      """SELECT o_orderkey, l_linenumber, l_quantity
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey = 7 AND l_orderkey = 7""",
    "p15_pipe" ->
      """SELECT c_custkey, c_name,
                CAST(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(18,2)) AS DOUBLE)
                  AS boosted_bal
         FROM customer WHERE c_acctbal > 5000.0""",
    "j3_zip" ->
      """WITH l AS (SELECT n_nationkey, n_name,
                           ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
              r AS (SELECT r_regionkey, r_name,
                           ROW_NUMBER() OVER (ORDER BY r_regionkey) AS rn FROM region)
         SELECT n_nationkey, n_name, r_regionkey, r_name FROM l JOIN r USING (rn)""",
    "j4_zip_limit" ->
      """WITH l AS (SELECT n_nationkey, n_name,
                           ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
              r AS (SELECT r_regionkey, r_name,
                           ROW_NUMBER() OVER (ORDER BY r_regionkey) AS rn
                    FROM (SELECT * FROM region ORDER BY r_regionkey LIMIT 3))
         SELECT n_nationkey, n_name, r_regionkey, r_name FROM l JOIN r USING (rn)""",
    "j5_tee" ->
      """SELECT s_suppkey, s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey""",
    "j6_log_zip" ->
      """WITH c AS (SELECT event_id AS click_id, user_id AS click_user,
                           ROW_NUMBER() OVER (ORDER BY event_id) AS rn
                    FROM events WHERE event_type = 'click'),
              v AS (SELECT event_id AS view_id, user_id AS view_user,
                           ROW_NUMBER() OVER (ORDER BY event_id) AS rn
                    FROM events WHERE event_type = 'view')
         SELECT click_id, click_user, view_id, view_user FROM c JOIN v USING (rn)""",
    "s6_sink_roundtrip" ->
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey""",
    "src_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey""",
    // wholetext round-trip: the staged files ARE the documents slice
    "src_text_roundtrip" ->
      """SELECT doc_id, text FROM documents WHERE doc_id < 25""",
    "src_json_roundtrip" ->
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey""",
    "src_orc_roundtrip" ->
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey""",
    "s7_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    // stateless branches => batch UNION ALL, same money-decimal doubling
    "s18_stream_union" ->
      """SELECT event_id, user_id, 'click' AS kind, value FROM events
         WHERE event_type = 'click'
         UNION ALL
         SELECT event_id, user_id, 'purchase_2x' AS kind,
                CAST(CAST(value AS DECIMAL(18,2)) * 2 AS DOUBLE) AS value
         FROM events WHERE event_type = 'purchase'""",
    "q_window_range" ->
      """SELECT user_id, event_id,
                CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS sum_cents_1h
         FROM events""",
    "t_stateful_running" ->
      """SELECT user_id, COUNT(*) AS events,
                CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM events GROUP BY user_id""",
    "t_stream_stateful" ->
      """SELECT user_id, COUNT(*) AS events,
                CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM events GROUP BY user_id""",
    "t_stream_canonical" ->
      """SELECT user_id, event_type, MIN(event_id) AS min_event_id
         FROM events GROUP BY user_id, event_type""",
    // backpressure: one micro-batch per staged file (mtime order), so the
    // observed per-batch counts are exactly the per-slice cardinalities
    "t_stream_backpressure" ->
      """SELECT CAST(event_id % 4 AS BIGINT) AS batch_id, COUNT(*) AS n_rows
         FROM events GROUP BY 1""",
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q_lateral_topn" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
         FROM customer c, LATERAL (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
         ) o
         WHERE c.c_acctbal > 9000""",
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",
    "text_ngram_topk" ->
      """WITH s AS (SELECT string_split(text, ' ') AS w FROM documents),
              t AS (SELECT list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                           for i in range(1, len(w)-1) ]) AS sh
                    FROM s WHERE len(w) >= 3),
              u AS (SELECT unnest(sh) AS ngram FROM t)
         SELECT ngram, COUNT(*) AS n_docs FROM u
         GROUP BY ngram ORDER BY n_docs DESC, ngram ASC LIMIT 20""",
    "j2_zipwith" ->
      """WITH l AS (SELECT n_nationkey, n_name,
                           ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
              r AS (SELECT r_regionkey, r_name,
                           ROW_NUMBER() OVER (ORDER BY r_regionkey) AS rn FROM region)
         SELECT n_nationkey, n_name, r_regionkey, r_name FROM l JOIN r USING (rn)""",
    "u1_either" ->
      """SELECT 'left' AS side, c_name AS name FROM customer
         UNION ALL
         SELECT 'right' AS side, s_name AS name FROM supplier""",
    "u2_concat" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity <= 2.0
         UNION ALL
         SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity >= 49.0""",
    "q3_shipping" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                  AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
                       JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
         ORDER BY revenue DESC, o_orderkey ASC LIMIT 20""",
    "dedup_exact" ->
      """SELECT MD5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY 1""",
    // same 8-word framing + (min doc_id, min pos) keep rule + '\n' rejoin
    "dedup_paragraphs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              f AS (SELECT doc_id, ws,
                           unnest(range(0, CAST(ceil(len(ws) / 8.0) AS INT))) AS pos
                    FROM d),
              p AS (SELECT doc_id, pos,
                           array_to_string(ws[pos*8+1 : pos*8+8], ' ') AS para
                    FROM f),
              c1 AS (SELECT para, MIN(doc_id) AS cdoc FROM p GROUP BY 1),
              c2 AS (SELECT p.para, p.doc_id AS cdoc, MIN(p.pos) AS cpos
                     FROM p JOIN c1 ON p.para = c1.para AND p.doc_id = c1.cdoc
                     GROUP BY 1, 2),
              kept AS (SELECT p.doc_id, p.pos, p.para
                       FROM p JOIN c2 ON p.para = c2.para
                                     AND p.doc_id = c2.cdoc AND p.pos = c2.cpos)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
                string_agg(para, chr(10) ORDER BY pos) AS text
         FROM kept GROUP BY doc_id""",
    "pipe_clean_corpus" ->
      """WITH b AS (SELECT doc_id, text,
                length(text) AS n_chars,
                len(string_split(text, ' ')) AS n_words,
                len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS en,
                len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein|zu|mit|den)\b')) AS de,
                len(regexp_extract_all(text, '\b(le|la|les|et|est|un|une|de|que|pour)\b')) AS fr,
                len(regexp_extract_all(text, '\b(el|la|los|las|es|un|una|que|de|por)\b')) AS es,
                len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
              FROM documents),
              q AS (SELECT doc_id, n_words,
                least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 +
                least(CAST(en AS DOUBLE) / CAST(n_words AS DOUBLE) * 5.0, 1.0) * 0.3 +
                CAST(n_alpha AS DOUBLE) / NULLIF(CAST(n_chars AS DOUBLE), 0) * 0.3 AS quality,
                CASE WHEN en > 0 AND en = greatest(en, de, fr, es) THEN 'en'
                     WHEN de > 0 AND de = greatest(en, de, fr, es) THEN 'de'
                     WHEN fr > 0 AND fr = greatest(en, de, fr, es) THEN 'fr'
                     WHEN es > 0 AND es = greatest(en, de, fr, es) THEN 'es'
                     ELSE 'und' END AS pred_lang
              FROM b),
              k AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text))
         SELECT q.doc_id, n_words AS ws_tokens, quality
         FROM q
         WHERE quality >= 0.5 AND pred_lang = 'en'
           AND q.doc_id IN (SELECT doc_id FROM k)""",
    // the pipe_clean_corpus oracle plus the train split and the
    // text_decontaminate shingle CTE, composed over the same seeded text
    "pipe_training_corpus" ->
      """WITH seeded AS (
           SELECT doc_id,
                  CASE WHEN doc_id < 40 OR doc_id % 10 = 3
                       THEN text || ' the quick brown fox jumps over the lazy dog tonight'
                       ELSE text END AS text
           FROM documents),
           b AS (SELECT doc_id, text,
                length(text) AS n_chars,
                len(string_split(text, ' ')) AS n_words,
                len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS en,
                len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein|zu|mit|den)\b')) AS de,
                len(regexp_extract_all(text, '\b(le|la|les|et|est|un|une|de|que|pour)\b')) AS fr,
                len(regexp_extract_all(text, '\b(el|la|los|las|es|un|una|que|de|por)\b')) AS es,
                len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
              FROM seeded),
           q AS (SELECT doc_id, n_words,
                least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 +
                least(CAST(en AS DOUBLE) / CAST(n_words AS DOUBLE) * 5.0, 1.0) * 0.3 +
                CAST(n_alpha AS DOUBLE) / NULLIF(CAST(n_chars AS DOUBLE), 0) * 0.3 AS quality,
                CASE WHEN en > 0 AND en = greatest(en, de, fr, es) THEN 'en'
                     WHEN de > 0 AND de = greatest(en, de, fr, es) THEN 'de'
                     WHEN fr > 0 AND fr = greatest(en, de, fr, es) THEN 'fr'
                     WHEN es > 0 AND es = greatest(en, de, fr, es) THEN 'es'
                     ELSE 'und' END AS pred_lang
              FROM b),
           k AS (SELECT MIN(doc_id) AS doc_id FROM seeded GROUP BY MD5(text)),
           s2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM seeded),
           t2 AS (SELECT doc_id,
                         list_distinct([ w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
                                         w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]
                                         for i in range(1, len(w)-6) ]) AS sh
                  FROM s2 WHERE len(w) >= 8),
           ev AS (SELECT DISTINCT unnest(sh) AS g FROM t2 WHERE doc_id < 40),
           contam AS (SELECT DISTINCT tr.doc_id
                      FROM (SELECT doc_id, unnest(sh) AS g FROM t2 WHERE doc_id >= 40) tr
                      JOIN ev ON tr.g = ev.g)
         SELECT q.doc_id, n_words AS ws_tokens, quality
         FROM q
         WHERE q.doc_id >= 40 AND quality >= 0.5 AND pred_lang = 'en'
           AND q.doc_id IN (SELECT doc_id FROM k)
           AND q.doc_id NOT IN (SELECT doc_id FROM contam)""",
    "dedup_ngram_jaccard" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              t AS (SELECT doc_id,
                           list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                           for i in range(1, len(w)-1) ]) AS sh
                    FROM s WHERE len(w) >= 3)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
         FROM t a JOIN t b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8""",
    // same candidate pairs, classic unit-cost levenshtein on the same
    // 400-char prefixes
    "dedup_edit_distance" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              t AS (SELECT doc_id,
                           list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                           for i in range(1, len(w)-1) ]) AS sh
                    FROM s WHERE len(w) >= 3),
              p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                    FROM t a JOIN t b ON a.doc_id < b.doc_id
                    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                          CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8)
         SELECT p.doc_a, p.doc_b,
                CAST(levenshtein(substr(da.text, 1, 400), substr(db.text, 1, 400)) AS INT)
                  AS edit_dist
         FROM p JOIN documents da ON da.doc_id = p.doc_a
                JOIN documents db ON db.doc_id = p.doc_b""",
    // prefix filtering is lossless and verification exact, so the oracle
    // is plain brute-force Jaccard at the gate's 0.7 threshold — the
    // candidate discipline must not change the answer
    "dedup_jaccard_prefix" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              t AS (SELECT doc_id,
                           list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                           for i in range(1, len(w)-1) ]) AS sh
                    FROM s WHERE len(w) >= 3)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
         FROM t a JOIN t b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.7""",
    "dedup_minhash_lsh" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              t AS (SELECT doc_id,
                           list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                           for i in range(1, len(w)-1) ]) AS sh
                    FROM s WHERE len(w) >= 3)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
         FROM t a JOIN t b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8""",
    // transitive closure of the near-dup graph in pure SQL: DuckDB's
    // recursive CTE floods every node's reachable set (UNION dedups, so
    // it terminates), then min(lab) per node = the cluster minimum —
    // exactly the fixpoint min-label propagation converges to
    "dedup_cluster_cc" ->
      """WITH RECURSIVE
           s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           t AS (SELECT doc_id,
                        list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w)-1) ]) AS sh
                 FROM s WHERE len(w) >= 3),
           nat AS (SELECT a.doc_id AS da, b.doc_id AS db
                   FROM t a JOIN t b ON a.doc_id < b.doc_id
                   WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                         CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8),
           low AS (SELECT doc_id FROM documents WHERE doc_id < 50),
           chain AS (SELECT doc_id AS da, doc_id + 100000 AS db FROM low
                     UNION ALL
                     SELECT doc_id + 100000, doc_id + 200000 FROM low
                     UNION ALL
                     SELECT doc_id + 200000, doc_id + 300000 FROM low),
           pe AS (SELECT da, db FROM nat UNION ALL SELECT da, db FROM chain),
           edges AS (SELECT da AS a, db AS b FROM pe
                     UNION ALL SELECT db, da FROM pe),
           reach AS (SELECT a AS node, a AS lab FROM edges
                     UNION
                     SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node),
           cc AS (SELECT node, min(lab) AS canon FROM reach GROUP BY node),
           -- explicit DISTINCT over UNION ALL: inside WITH RECURSIVE,
           -- DuckDB carves a trailing UNION arm off as a pseudo-recursive
           -- term and skips deduplicating it against the base — a plain
           -- SELECT body sidesteps that parse entirely
           nodes AS (SELECT DISTINCT doc_id FROM (
                       SELECT doc_id FROM documents
                       UNION ALL SELECT da FROM chain
                       UNION ALL SELECT db FROM chain))
         SELECT n.doc_id AS doc_id, coalesce(cc.canon, n.doc_id) AS canon_id
         FROM nodes n LEFT JOIN cc ON cc.node = n.doc_id""",
    "dedup_incremental" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents),
              batch AS (SELECT doc_id + 500000 AS doc_id,
                               CASE WHEN doc_id % 2 = 0 THEN text
                                    ELSE text || ' fresh content' END AS text
                        FROM corpus WHERE doc_id % 11 = 0),
              bh AS (SELECT doc_id, md5(text) AS h FROM batch),
              ch AS (SELECT DISTINCT md5(text) AS h FROM corpus)
         SELECT min(bh.doc_id) AS doc_id, bh.h AS h
         FROM bh LEFT JOIN ch ON bh.h = ch.h
         WHERE ch.h IS NULL
         GROUP BY bh.h""",
    // zipped UNNESTs give (0-based pos, value) pairs; list(... ORDER BY
    // vec_id) + list_reduce over a PREPENDED 0.0 seed is the same
    // zero-seeded sorted left fold the Spark side runs, so the float
    // means are bit-identical (an unseeded list_reduce starts from the
    // first element and would keep -0.0 on an all-negative-zero group
    // where Spark's 0.0 seed yields +0.0)
    // full two-iteration Lloyd replay: same seeds (k smallest ids), same
    // seeded-fold distances and centroid means, same (dist, cl) tie-break
    "sim_kmeans" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            c0 AS (SELECT CAST(rn - 1 AS INT) AS cl, v AS cent
                   FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM e)
                   WHERE rn <= 8),
            d1 AS (SELECT e.vec_id, c.cl,
                          list_reduce(list_prepend(0.0,
                            [ (e.v[i] - c.cent[i]) * (e.v[i] - c.cent[i])
                              for i in range(1, len(e.v) + 1) ]),
                            (a, b) -> a + b) AS dist
                   FROM e CROSS JOIN c0 c),
            a1 AS (SELECT vec_id, cl FROM d1
                   QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1),
            x1 AS (SELECT a.cl, e.vec_id, UNNEST(range(0, len(e.v))) AS pos, UNNEST(e.v) AS val
                   FROM a1 a JOIN e USING (vec_id)),
            g1 AS (SELECT cl, pos, list(val ORDER BY vec_id) AS vs FROM x1 GROUP BY cl, pos),
            p1 AS (SELECT cl, pos,
                          list_reduce(list_prepend(0.0, vs), (a, b) -> a + b) / len(vs) AS cv
                   FROM g1),
            c1 AS (SELECT cl, list(cv ORDER BY pos) AS cent FROM p1 GROUP BY cl),
            d2 AS (SELECT e.vec_id, c.cl,
                          list_reduce(list_prepend(0.0,
                            [ (e.v[i] - c.cent[i]) * (e.v[i] - c.cent[i])
                              for i in range(1, len(e.v) + 1) ]),
                            (a, b) -> a + b) AS dist
                   FROM e CROSS JOIN c1 c),
            a2 AS (SELECT vec_id, cl FROM d2
                   QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1),
            x2 AS (SELECT a.cl, e.vec_id, UNNEST(range(0, len(e.v))) AS pos, UNNEST(e.v) AS val
                   FROM a2 a JOIN e USING (vec_id)),
            g2 AS (SELECT cl, pos, list(val ORDER BY vec_id) AS vs FROM x2 GROUP BY cl, pos),
            p2 AS (SELECT cl, pos,
                          list_reduce(list_prepend(0.0, vs), (a, b) -> a + b) / len(vs) AS cv
                   FROM g2),
            c2 AS (SELECT cl, list(cv ORDER BY pos) AS cent FROM p2 GROUP BY cl),
            d3 AS (SELECT e.vec_id, c.cl,
                          list_reduce(list_prepend(0.0,
                            [ (e.v[i] - c.cent[i]) * (e.v[i] - c.cent[i])
                              for i in range(1, len(e.v) + 1) ]),
                            (a, b) -> a + b) AS dist
                   FROM e CROSS JOIN c2 c)
         SELECT vec_id, cl AS cluster FROM d3
         QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1""",
    "sim_label_centroids" ->
      """WITH e AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              x AS (SELECT label, vec_id,
                           UNNEST(range(0, len(v))) AS pos,
                           UNNEST(v) AS val
                    FROM e),
              g AS (SELECT label, pos, list(val ORDER BY vec_id) AS vs
                    FROM x GROUP BY label, pos)
         SELECT label, pos,
                list_reduce(list_prepend(0.0, vs), (a, b) -> a + b) / len(vs) AS centroid
         FROM g""",
    // same transitive closure as dedup_cluster_cc (natural edges only),
    // then per-cluster arg-max on (quality, doc_id) via a DESC row_number
    // — lexicographic on the same IEEE doubles the text_quality oracle
    // already matches bit-for-bit
    "dedup_keep_best" ->
      """WITH RECURSIVE
           s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           t AS (SELECT doc_id,
                        list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w)-1) ]) AS sh
                 FROM s WHERE len(w) >= 3),
           nat AS (SELECT a.doc_id AS da, b.doc_id AS db
                   FROM t a JOIN t b ON a.doc_id < b.doc_id
                   WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                         CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8),
           edges AS (SELECT da AS a, db AS b FROM nat
                     UNION ALL SELECT db, da FROM nat),
           reach AS (SELECT a AS node, a AS lab FROM edges
                     UNION
                     SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node),
           cc AS (SELECT node, min(lab) AS canon FROM reach GROUP BY node),
           member AS (SELECT d.doc_id, coalesce(cc.canon, d.doc_id) AS canon_id
                      FROM documents d LEFT JOIN cc ON cc.node = d.doc_id),
           b AS (SELECT doc_id,
                        length(text) AS n_chars,
                        len(string_split(text, ' ')) AS n_words,
                        len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS n_stop,
                        len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
                 FROM documents),
           -- NULLIF mirrors the engine's try_divide NULL-on-zero (a
           -- zero-length text would otherwise be NaN here, and DuckDB
           -- sorts NaN GREATER than any value while Spark's struct max
           -- ranks the NULL-quality row last — the divergence would
           -- SELECT the keeper, not just shade a value)
           q AS (SELECT doc_id,
                        least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 +
                        least(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 5.0, 1.0) * 0.3 +
                        CAST(n_alpha AS DOUBLE) / NULLIF(CAST(n_chars AS DOUBLE), 0) * 0.3 AS quality
                 FROM b),
           r AS (SELECT m.canon_id, q.doc_id, q.quality,
                        row_number() OVER (PARTITION BY m.canon_id
                                           ORDER BY q.quality DESC NULLS LAST,
                                                    q.doc_id DESC) AS rn
                 FROM member m JOIN q USING (doc_id))
         SELECT canon_id, doc_id AS keep_id, quality AS keep_quality
         FROM r WHERE rn = 1""",
    // NULL-on-zero convention (r4 advice #4): the engine maps zero-norm
    // cosines to NULL via try_divide; plain DuckDB division would give
    // NaN, and DuckDB sorts/compares NaN GREATER than any value, so the
    // oracle encodes the same convention explicitly (NULL never passes
    // the >= threshold filter in either engine).
    "dedup_embedding_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       CASE WHEN list_dot_product(a.v, a.v) = 0
                              OR list_dot_product(b.v, b.v) = 0 THEN NULL
                            ELSE list_dot_product(a.v, b.v) /
                                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                       END AS cos
                FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, cos FROM p WHERE cos >= 0.45""",
    // exact all-pairs cosine edges (the SQL proven by
    // dedup_embedding_cosine) + the recursive-CTE closure proven by
    // dedup_cluster_cc + min-id representative
    "dedup_semantic" ->
      """WITH RECURSIVE
           e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                        CASE WHEN list_dot_product(a.v, a.v) = 0
                               OR list_dot_product(b.v, b.v) = 0 THEN NULL
                             ELSE list_dot_product(a.v, b.v) /
                                  (sqrt(list_dot_product(a.v, a.v)) *
                                   sqrt(list_dot_product(b.v, b.v)))
                        END AS cos
                 FROM e a JOIN e b ON a.vec_id < b.vec_id),
           pe AS (SELECT id_a, id_b FROM p WHERE cos >= 0.45),
           edges AS (SELECT id_a AS a, id_b AS b FROM pe
                     UNION ALL SELECT id_b, id_a FROM pe),
           reach AS (SELECT a AS node, a AS lab FROM edges
                     UNION
                     SELECT e2.a, r.lab FROM edges e2 JOIN reach r ON e2.b = r.node),
           cc AS (SELECT node, min(lab) AS canon FROM reach GROUP BY node)
         SELECT em.vec_id,
                coalesce(cc.canon, em.vec_id) AS canon_id,
                coalesce(cc.canon, em.vec_id) = em.vec_id AS kept
         FROM e em LEFT JOIN cc ON cc.node = em.vec_id""",
    "dedup_embedding_cosine_t90" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              e AS (SELECT vec_id, v FROM base
                    UNION ALL
                    SELECT vec_id + 100000 AS vec_id,
                           list_transform(v, x -> x * 2) AS v
                    FROM base),
              p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       CASE WHEN list_dot_product(a.v, a.v) = 0
                              OR list_dot_product(b.v, b.v) = 0 THEN NULL
                            ELSE list_dot_product(a.v, b.v) /
                                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                       END AS cos
                FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, cos FROM p WHERE cos >= 0.9""",
    // zero vectors: scale = 0 and every element NULL (the engine's
    // try_divide convention) — encoded here instead of relying on the
    // corpus containing no zero vectors (r4 advice #4)
    "sim_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              s AS (SELECT vec_id, v,
                           list_max(list_transform(v, x -> abs(x))) AS scale
                    FROM e)
         SELECT vec_id, scale,
                array_to_string(list_transform(v, x ->
                  coalesce(CAST(CASE WHEN scale = 0 THEN NULL
                                     ELSE CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)
                                END AS VARCHAR), 'null')), ',') AS q
         FROM s""",
    // zero-norm vectors score NULL (engine drops them before ranking) —
    // same explicit convention as the cosine-pair oracles (r4 advice #4)
    "sim_brute_topk" -> bruteTopkSql,
    // raw dot ranking (MIPS): no norms, no NULL path
    "sim_mips_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT * FROM e WHERE vec_id < 10),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     list_dot_product(q.v, c.v) AS s
              FROM q JOIN e c ON q.vec_id <> c.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id, s,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY s DESC, neighbor_id ASC) AS rank
              FROM scored)
       SELECT query_id, neighbor_id, s AS score, CAST(rank AS INT) AS rank
       FROM ranked WHERE rank <= 5""",
    // identical 32-bit word packing (bit i of word w = sign of element
    // w*32+i), integer XOR+popcount distance, same (hamming asc, id asc)
    // rank order
    "sim_binary_hamming" ->
      """WITH s AS (SELECT vec_id,
                [ list_sum([ CASE WHEN embedding[w*32+i+1] > 0
                             THEN (1::BIGINT << i) ELSE 0::BIGINT END
                             for i in range(0,32) ])
                  for w in range(0,2) ] AS sig
              FROM embeddings),
            q AS (SELECT * FROM s WHERE vec_id < 10),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     CAST(list_sum([ bit_count(xor(q.sig[j+1], c.sig[j+1]))
                                     for j in range(0,2) ]) AS INT) AS hamming
              FROM q JOIN s c ON q.vec_id <> c.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id, hamming,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY hamming ASC, neighbor_id ASC) AS rank
              FROM scored)
       SELECT query_id, neighbor_id, hamming, CAST(rank AS INT) AS rank
       FROM ranked WHERE rank <= 5""",
    // exhaustive IVF (nprobe = nlist) must equal brute force exactly
    "sim_ivf_exhaustive" -> bruteTopkSql,
    // composition of the two already-oracled rankings + one exact count/k
    "sim_lsh_recall" ->
      s"""WITH b AS ($bruteTopkSql),
             l AS ($lshTopkSql)
          SELECT b.query_id,
                 CAST(count(l.neighbor_id) AS DOUBLE) / 5.0 AS recall
          FROM b LEFT JOIN l
            ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
          GROUP BY b.query_id""",
    // full LSH replication: seeded hyperplanes interpolated as literals
    "sim_lsh_topk" -> lshTopkSql,
    // differential invariant oracles (see the queries entries): the exact
    // parts hash-verify; the estimator/implementation contracts are
    // constant booleans that flip on drift
    "q_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
                count(DISTINCT l_orderkey) AS exact_orders,
                true AS parts_within_tol, true AS orders_within_tol
         FROM lineitem""",
    "dedup_simhash" ->
      """SELECT doc_id, true AS order_invariant, true AS in_range
         FROM documents""",
    "text_fingerprint" ->
      """SELECT doc_id, true AS forms_agree FROM documents""",
    // differential invariants (see the queries entries): constants per query
    "sim_ivf_topk" ->
      """SELECT vec_id AS query_id, 5 AS n_results, 5 AS n_rank_ok,
                5 AS n_score_exact, CAST(0.0 AS DOUBLE) AS max_score_err
         FROM embeddings WHERE vec_id < 10""",
    // batch path: same invariants — identical scoring expressions, only
    // the physical probe plan differs
    "sim_ivf_batch" ->
      """SELECT vec_id AS query_id, 5 AS n_results, 5 AS n_rank_ok,
                5 AS n_score_exact, CAST(0.0 AS DOUBLE) AS max_score_err
         FROM embeddings WHERE vec_id < 10""",
    "sim_pq_topk" ->
      """SELECT vec_id AS query_id, 5 AS n_results, 5 AS n_distinct,
                5 AS n_rank_ok, true AS scores_match_recon
         FROM embeddings WHERE vec_id < 10""",
    // composed IVF+PQ probe: identical invariant constants
    "sim_ivfpq_topk" ->
      """SELECT vec_id AS query_id, 5 AS n_results, 5 AS n_distinct,
                5 AS n_rank_ok, true AS scores_match_recon
         FROM embeddings WHERE vec_id < 10""",
    "text_langid" ->
      """WITH h AS (SELECT doc_id, text,
                len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS en,
                len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein|zu|mit|den)\b')) AS de,
                len(regexp_extract_all(text, '\b(le|la|les|et|est|un|une|de|que|pour)\b')) AS fr,
                len(regexp_extract_all(text, '\b(el|la|los|las|es|un|una|que|de|por)\b')) AS es
              FROM documents)
         SELECT doc_id,
                CASE WHEN en > 0 AND en = greatest(en, de, fr, es) THEN 'en'
                     WHEN de > 0 AND de = greatest(en, de, fr, es) THEN 'de'
                     WHEN fr > 0 AND fr = greatest(en, de, fr, es) THEN 'fr'
                     WHEN es > 0 AND es = greatest(en, de, fr, es) THEN 'es'
                     ELSE 'und' END AS pred_lang,
                en AS en_hits
         FROM h""",
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                    FROM documents),
              c AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY doc_id, word),
              s AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
                           COUNT(*) AS n_distinct, CAST(MAX(n) AS BIGINT) AS top_count
                    FROM c GROUP BY doc_id)
         SELECT doc_id, n_words, n_distinct,
                CAST(n_words - n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac,
                CAST(top_count AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac
         FROM s""",
    "pii_scrub" ->
      """WITH planted AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0
                       THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or +1-555-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE text END AS text
           FROM documents)
         SELECT doc_id,
                regexp_replace(regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\+?1-555-[0-9]{4}', '<PHONE>', 'g') AS clean
         FROM planted""",
    "corpus_stratified_sample" ->
      """WITH h AS (SELECT doc_id, text,
                len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS en,
                len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein|zu|mit|den)\b')) AS de,
                len(regexp_extract_all(text, '\b(le|la|les|et|est|un|une|de|que|pour)\b')) AS fr,
                len(regexp_extract_all(text, '\b(el|la|los|las|es|un|una|que|de|por)\b')) AS es
              FROM documents),
              l AS (SELECT doc_id,
                CASE WHEN en > 0 AND en = greatest(en, de, fr, es) THEN 'en'
                     WHEN de > 0 AND de = greatest(en, de, fr, es) THEN 'de'
                     WHEN fr > 0 AND fr = greatest(en, de, fr, es) THEN 'fr'
                     WHEN es > 0 AND es = greatest(en, de, fr, es) THEN 'es'
                     ELSE 'und' END AS lang
              FROM h)
         SELECT doc_id, lang FROM l
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100 <
               CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 50
                         WHEN 'fr' THEN 50 WHEN 'es' THEN 50 ELSE 100 END""",
    // same per-source rank and (rank + 0.5) / weight virtual-time merge
    "corpus_interleave" ->
      """WITH r AS (SELECT doc_id, source,
                           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS sr
                    FROM documents),
            k AS (SELECT doc_id,
                         (sr + 0.5) / (1.0 + CAST(substr(source, 4, 8) AS INT) % 3) AS sk
                  FROM r)
         SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sk, doc_id) - 1 AS interleave_ord
         FROM k""",
    // same heaviest-first round-robin deal: rank % 8 over the total order
    "corpus_shard_balanced" ->
      """SELECT doc_id,
                CAST((ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1) % 8 AS INT)
                  AS shard
         FROM documents""",
    "corpus_epoch_shuffle" ->
      """SELECT doc_id,
                ROW_NUMBER() OVER (ORDER BY md5(concat_ws('#', '7',
                                     CAST(doc_id AS VARCHAR))), doc_id) - 1
                  AS epoch_ord
         FROM documents""",
    // the TopK-Aggregator cap is equivalent to the window form for finite
    // scores (score desc, doc_id asc is a total order)
    "corpus_source_cap" ->
      """WITH b AS (SELECT doc_id, source,
                length(text) AS n_chars,
                len(string_split(text, ' ')) AS n_words,
                len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS n_stop,
                len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
              FROM documents),
           q AS (SELECT doc_id, source,
                least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 +
                least(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 5.0, 1.0) * 0.3 +
                CAST(n_alpha AS DOUBLE) / NULLIF(CAST(n_chars AS DOUBLE), 0) * 0.3 AS score
              FROM b),
           r AS (SELECT source, doc_id, score,
                        ROW_NUMBER() OVER (PARTITION BY source
                                           ORDER BY score DESC, doc_id ASC) AS rk
                 FROM q WHERE score IS NOT NULL)
         SELECT source, doc_id, score, rk FROM r WHERE rk <= 10""",
    "text_perplexity" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           tok AS (SELECT doc_id,
                          unnest(range(1, len(ws) + 1)) AS pos,
                          unnest(ws) AS w
                   FROM s),
           vocab AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
           tot AS (SELECT COUNT(*) AS total FROM tok),
           lp AS (SELECT doc_id, pos,
                         -ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) AS lp
                  FROM tok JOIN vocab USING (w) CROSS JOIN tot),
           g AS (SELECT doc_id, list(lp ORDER BY pos) AS lps FROM lp GROUP BY doc_id)
         SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_tokens,
                list_reduce(list_prepend(0.0, lps), (a, b) -> a + b) / len(lps) AS xent
         FROM g""",
    "corpus_vocab" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
              v AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1
                    HAVING COUNT(*) >= 2)
         SELECT term, cnt,
                CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS BIGINT)
                  AS token_id
         FROM v""",
    // tokenize = vocab-rank join + per-doc ordered id list; OOV -> 0
    "corpus_tokenize" ->
      """WITH tok0 AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
              v AS (SELECT term, COUNT(*) AS cnt FROM tok0 GROUP BY 1
                    HAVING COUNT(*) >= 2),
              vid AS (SELECT term,
                             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS BIGINT)
                               AS token_id
                      FROM v),
              s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              tok AS (SELECT doc_id,
                             unnest(range(1, len(ws) + 1)) AS pos,
                             unnest(ws) AS w
                      FROM s),
              j AS (SELECT t.doc_id, t.pos, COALESCE(vid.token_id, 0) AS tid
                    FROM tok t LEFT JOIN vid ON t.w = vid.term)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                array_to_string(list(tid ORDER BY pos), ',') AS token_ids
         FROM j GROUP BY doc_id""",
    // bigram conditional: P(w2|w1) = c(w1,w2)/c(w1,·); same ordered-fold
    // mean as text_perplexity
    "text_bigram_xent" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           b AS (SELECT doc_id, unnest(range(0, len(w) - 1)) AS pos, w
                 FROM s WHERE len(w) >= 2),
           bb AS (SELECT doc_id, pos, w[pos+1] AS w1, w[pos+2] AS w2 FROM b),
           c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bb GROUP BY 1, 2),
           c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1),
           lp AS (SELECT bb.doc_id, bb.pos,
                         -ln(CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE)) AS lp
                  FROM bb JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
           g AS (SELECT doc_id, list(lp ORDER BY pos) AS lps FROM lp GROUP BY doc_id)
         SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_bigrams,
                list_reduce(list_prepend(0.0, lps), (a, b) -> a + b) / len(lps) AS xent
         FROM g""",
    "q_range_join" ->
      """SELECT i.event_id AS spike_id, p.event_id AS click_id, p.user_id,
                epoch_us(p.ts) - epoch_us(i.ts) AS gap_us
         FROM (SELECT * FROM events WHERE event_type = 'error' AND value > 150.0) i
         JOIN (SELECT * FROM events WHERE event_type = 'click') p
           ON epoch_us(p.ts) >= epoch_us(i.ts)
          AND epoch_us(p.ts) <= epoch_us(i.ts) + 600000000""",
    // slice + array_to_string builds the identical space-joined window
    // strings the codegen'd shingle expression emits
    "dedup_substring" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              t AS (SELECT doc_id,
                           list_distinct([ array_to_string(w[i:i+19], ' ')
                                           for i in range(1, len(w) - 18) ]) AS sh
                    FROM s WHERE len(w) >= 20),
              e AS (SELECT doc_id, unnest(sh) AS g FROM t)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
         FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
         GROUP BY 1, 2""",
    // identical shingling, plus the HAVING df <= 3 heavy-hitter filter the
    // Spark side applies via its maxDocFreq anti-join
    "dedup_substring_capped" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              t AS (SELECT doc_id,
                           list_distinct([ array_to_string(w[i:i+19], ' ')
                                           for i in range(1, len(w) - 18) ]) AS sh
                    FROM s WHERE len(w) >= 20),
              e AS (SELECT doc_id, unnest(sh) AS g FROM t),
              kept AS (SELECT g FROM e GROUP BY g HAVING COUNT(*) <= 3),
              ek AS (SELECT e.doc_id, e.g FROM e JOIN kept USING (g))
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
         FROM ek a JOIN ek b ON a.g = b.g AND a.doc_id < b.doc_id
         GROUP BY 1, 2""",
    // append-mode emits exactly the finalized windows (window_end ≤ final
    // watermark = max(ts) − 10 min, micro-truncated like the Spark side);
    // the replayed late rows must contribute NOTHING — the count is over
    // the original feed only
    "s10_stream_late_drop" ->
      // Spark's committed watermark truncates max event time to MILLIS
      // (EventTimeStats) before subtracting the delay — mirror that
      // (// 1000 * 1000) or a sub-ms remainder in a regenerated corpus
      // could flip an hour-aligned window across the cutoff
      """WITH wm AS (SELECT (max(epoch_us(ts)) // 1000) * 1000 - 600000000 AS w
                     FROM events)
         SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
                COUNT(*) AS n
         FROM events, wm
         WHERE epoch_us(time_bucket(INTERVAL '1 hour', ts)) + 3600000000 <= w
         GROUP BY 1, 2""",
    // the streaming form must converge to exactly the batch answer
    "s9_stream_range_join" ->
      """SELECT i.event_id AS spike_id, p.event_id AS click_id, p.user_id,
                epoch_us(p.ts) - epoch_us(i.ts) AS gap_us
         FROM (SELECT * FROM events WHERE event_type = 'error' AND value > 150.0) i
         JOIN (SELECT * FROM events WHERE event_type = 'click') p
           ON epoch_us(p.ts) >= epoch_us(i.ts)
          AND epoch_us(p.ts) <= epoch_us(i.ts) + 600000000""",
    // same planted-contamination synthesis as the Spark side; the 8-gram
    // comprehension is stop-exclusive range(1, len-6) = Spark's
    // sequence(0, size-8) shingle starts
    "text_decontaminate" -> decontaminateOracleSql,
    // the Bloom prune is result-invariant (exact join removes false
    // positives, false negatives impossible) — same oracle, verbatim
    "text_decontaminate_bloom" -> decontaminateOracleSql,
    // double ops mirror the Spark side op-for-op: exact long sums, one
    // cast each, one divide (share), then (1.0/n)/share for the weight
    "corpus_mix_weights" ->
      """WITH b AS (SELECT source, len(string_split(text, ' ')) AS toks FROM documents),
              a AS (SELECT source, CAST(SUM(toks) AS BIGINT) AS toks FROM b GROUP BY source)
         SELECT source, toks,
                CAST(toks AS DOUBLE) / CAST(SUM(toks) OVER () AS DOUBLE) AS share,
                (1.0 / COUNT(*) OVER ()) /
                  (CAST(toks AS DOUBLE) / CAST(SUM(toks) OVER () AS DOUBLE)) AS weight
         FROM a""",
    "text_rarity" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
              df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY w),
              j AS (SELECT t.doc_id, d.df FROM w t JOIN df d USING (w))
         SELECT doc_id, COUNT(*) AS n_tokens,
                CAST(SUM(df) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_df
         FROM j GROUP BY doc_id""",
    // integer tf/df aggregation; the one floating step (tf·ln(N/df)) is
    // the same IEEE divide→ln→multiply sequence in both engines
    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                      FROM documents),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
                     GROUP BY 1, 2 HAVING COUNT(*) >= 2),
              df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
              n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
         SELECT tf.doc_id, tf.term, tf.tf, df.df,
                CAST(tf.tf AS DOUBLE) *
                  ln(CAST(n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
         FROM tf JOIN df USING (term), n""",
    // top-3 of the same tfidf values (bit-equal per text_tfidf's hash),
    // ties by term
    "text_keywords" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                      FROM documents),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
                     GROUP BY 1, 2 HAVING COUNT(*) >= 2),
              df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
              n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
              scored AS (SELECT tf.doc_id, tf.term,
                                CAST(tf.tf AS DOUBLE) *
                                  ln(CAST(n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
                         FROM tf JOIN df USING (term), n)
         SELECT doc_id, term,
                CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY tfidf DESC, term ASC) AS INT) AS rank
         FROM scored
         QUALIFY rank <= 3""",
    // exact integer counts of the true heavy hitters; MG membership is
    // guaranteed for them, so in_sketch is the constant the sketch must hit
    "text_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
                      FROM documents),
              e AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1),
              n AS (SELECT COUNT(*) AS n FROM tok)
         SELECT term, cnt, true AS in_sketch FROM e, n WHERE cnt * 64 > n""",
    "text_lang_mismatch" ->
      """WITH h AS (SELECT doc_id, lang, text,
                len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS en,
                len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein|zu|mit|den)\b')) AS de,
                len(regexp_extract_all(text, '\b(le|la|les|et|est|un|une|de|que|pour)\b')) AS fr,
                len(regexp_extract_all(text, '\b(el|la|los|las|es|un|una|que|de|por)\b')) AS es
              FROM documents),
              l AS (SELECT doc_id, lang AS declared,
                CASE WHEN en > 0 AND en = greatest(en, de, fr, es) THEN 'en'
                     WHEN de > 0 AND de = greatest(en, de, fr, es) THEN 'de'
                     WHEN fr > 0 AND fr = greatest(en, de, fr, es) THEN 'fr'
                     WHEN es > 0 AND es = greatest(en, de, fr, es) THEN 'es'
                     ELSE 'und' END AS pred_lang
              FROM h)
         SELECT doc_id, declared, pred_lang FROM l WHERE pred_lang <> declared""",
    "text_quality" ->
      """WITH b AS (SELECT doc_id,
                length(text) AS n_chars,
                len(string_split(text, ' ')) AS n_words,
                len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS n_stop,
                len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
              FROM documents)
         SELECT doc_id, n_chars, n_words,
                CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
                CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stopword_ratio,
                CAST(n_alpha AS DOUBLE) / NULLIF(CAST(n_chars AS DOUBLE), 0) AS alpha_ratio,
                least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 +
                least(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 5.0, 1.0) * 0.3 +
                CAST(n_alpha AS DOUBLE) / NULLIF(CAST(n_chars AS DOUBLE), 0) * 0.3 AS quality
         FROM b""",
    // same quality formula (bit-equal per text_quality's hash), same
    // per-source ntile(2) cut
    "corpus_quality_filter" ->
      """WITH b AS (SELECT doc_id, source,
                length(text) AS n_chars,
                len(string_split(text, ' ')) AS n_words,
                len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS n_stop,
                len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
              FROM documents),
            q AS (SELECT doc_id, source,
                least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 +
                least(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 5.0, 1.0) * 0.3 +
                CAST(n_alpha AS DOUBLE) / NULLIF(CAST(n_chars AS DOUBLE), 0) * 0.3 AS quality
              FROM b)
         SELECT doc_id, source, quality FROM q
         QUALIFY ntile(2) OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id ASC) = 1""",
    "text_normalize" ->
      """WITH messy AS (
           SELECT doc_id,
                  upper(substr(text, 1, 40)) || chr(10) ||
                  'Copyright 2024 ALL RIGHTS RESERVED' || chr(10) ||
                  text || chr(10) ||
                  '  Cafe' || chr(769) || ' ' || chr(9) || ' du  Monde ' AS raw
           FROM documents)
         SELECT doc_id,
                trim(regexp_replace(lower(nfc_normalize(
                  list_aggregate(
                    list_filter(string_split(raw, chr(10)),
                      l -> NOT regexp_matches(l, '(?i)^\s*(copyright\b|all rights reserved\b|terms of (service|use)\b|privacy policy\b|click here\b)')),
                    'string_agg', chr(10))
                )), '\s+', ' ', 'g')) AS clean
         FROM messy""",
    "dedup_normalized" ->
      """WITH twins AS (
           SELECT doc_id + 100000 AS doc_id,
                  '  ' || upper(substr(text, 1, 15)) || substr(text, 16, 1000000)
                       || ' ' || chr(9) AS text
           FROM documents),
           all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id, text FROM twins),
           norm AS (
           SELECT doc_id,
                  trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS clean
           FROM all_docs)
         SELECT md5(clean) AS fp, MIN(doc_id) AS canonical_id, COUNT(*) AS n_dups
         FROM norm GROUP BY 1""",
    "corpus_sample_hash" ->
      """SELECT doc_id FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10 < 1""",
    // same min-label clusters via recursive CTE flood (the
    // dedup_cluster_cc machinery, natural pairs only), same md5 split CASE
    "corpus_split_safe" ->
      """WITH RECURSIVE
           s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           t AS (SELECT doc_id,
                        list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w)-1) ]) AS sh
                 FROM s WHERE len(w) >= 3),
           nat AS (SELECT a.doc_id AS da, b.doc_id AS db
                   FROM t a JOIN t b ON a.doc_id < b.doc_id
                   WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                         CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8),
           edges AS (SELECT da AS a, db AS b FROM nat
                     UNION ALL SELECT db, da FROM nat),
           reach AS (SELECT a AS node, a AS lab FROM edges
                     UNION
                     SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node),
           cc AS (SELECT node, min(lab) AS canon FROM reach GROUP BY node),
           rep AS (SELECT d.doc_id, coalesce(cc.canon, d.doc_id) AS rep
                   FROM documents d LEFT JOIN cc ON cc.node = d.doc_id),
           b AS (SELECT doc_id, rep,
                        ('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 8))::UBIGINT % 100 AS bk
                 FROM rep)
         SELECT doc_id, rep,
                CASE WHEN bk < 90 THEN 'train'
                     WHEN bk < 95 THEN 'val'
                     ELSE 'test' END AS split
         FROM b""",
    // A-ES weighted sample: identical md5 uniform, identical u^(1/w) key
    // rounded to 6 dp before the ORDER BY ... LIMIT selection
    "corpus_weighted_sample" ->
      """SELECT doc_id, n_chars,
                round(pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 0.5)
                            / 4294967296.0,
                          1.0 / n_chars), 6) AS samp_key
         FROM documents
         ORDER BY samp_key DESC, doc_id ASC
         LIMIT 60""",
    // identical staged markup (concat from doc_id), identical
    // backreference-free regex chain with 'g' flags, entities unescaped
    // in the same order (&amp; last)
    "text_strip_html" ->
      """WITH h AS (SELECT doc_id,
              '<html><head><style type="text/css">p{margin:0}</style><script>track("'
              || doc_id || '")</script></head><body><h1>Doc ' || doc_id
              || '</h1><p>' || text || '</p><br/><a href="/d/' || doc_id
              || '">&lt;more&gt; &amp; &quot;info&quot;</a></body></html>' AS html
            FROM documents)
         SELECT doc_id,
                trim(regexp_replace(
                  replace(replace(replace(replace(replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                      '<[^>]+>', ' ', 'g'),
                    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
                  '\s+', ' ', 'g')) AS clean,
                length(trim(regexp_replace(
                  replace(replace(replace(replace(replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                      '<[^>]+>', ' ', 'g'),
                    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
                  '\s+', ' ', 'g'))) AS n_clean_chars
         FROM h""",
    "corpus_pack_budget" ->
      """WITH d AS (
           SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 8 AS INT) AS shard
           FROM documents),
           r AS (
           SELECT doc_id, shard, n_tokens,
                  CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS tok_before
           FROM d)
         SELECT doc_id, shard, n_tokens,
                CAST(floor(tok_before / 512.0) AS BIGINT) AS bin,
                tok_before % 512 AS bin_offset
         FROM r""",
    // the composed pipe's token counts are the same single-space split
    // lengths, so the pack stage's oracle is the corpus_pack_budget SQL
    "pipe_pretokenize" ->
      """WITH d AS (
           SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 8 AS INT) AS shard
           FROM documents),
           r AS (
           SELECT doc_id, shard, n_tokens,
                  CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS tok_before
           FROM d)
         SELECT doc_id, shard, n_tokens,
                CAST(floor(tok_before / 512.0) AS BIGINT) AS bin,
                tok_before % 512 AS bin_offset
         FROM r""",
    // identical 64/48 windowing replayed with unnest(range) + 1-based
    // inclusive list slicing (both engines clamp the final window)
    "corpus_chunk" -> chunkOracleSql,
    // chunking + the text_quality scoring (IEEE-identical doubles) +
    // row_number arg-max + embedding payload join
    "pipe_rag_index" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
              c AS (SELECT doc_id, toks,
                           CASE WHEN len(toks) <= 64 THEN 1
                                ELSE CAST(ceil((len(toks) - 16) / 48.0) AS INT)
                           END AS nc
                    FROM t),
              x AS (SELECT doc_id, unnest(range(0, nc)) AS chunk_id, toks FROM c),
              ch AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                            array_to_string(toks[chunk_id*48+1 : chunk_id*48+64], ' ') AS chunk_text
                     FROM x),
              b AS (SELECT doc_id, chunk_id,
                           length(chunk_text) AS n_chars,
                           len(string_split(chunk_text, ' ')) AS n_words,
                           len(regexp_extract_all(chunk_text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS n_stop,
                           len(regexp_extract_all(chunk_text, '[A-Za-z]')) AS n_alpha
                    FROM ch),
              q AS (SELECT doc_id, chunk_id,
                           least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 +
                           least(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 5.0, 1.0) * 0.3 +
                           CAST(n_alpha AS DOUBLE) / NULLIF(CAST(n_chars AS DOUBLE), 0) * 0.3 AS quality
                    FROM b),
              r AS (SELECT doc_id, chunk_id, quality,
                           row_number() OVER (PARTITION BY doc_id
                                              ORDER BY quality DESC, chunk_id) AS rk
                    FROM q WHERE quality IS NOT NULL)
         SELECT r.doc_id, r.chunk_id AS best_chunk, r.quality, e.label
         FROM r JOIN embeddings e ON e.vec_id = r.doc_id
         WHERE rk = 1""",
    // the streaming form must converge to exactly the batch chunking
    "s11_stream_chunk" -> chunkOracleSql,
    "text_tokens" ->
      """SELECT doc_id,
                len(string_split(text, ' ')) AS ws_tokens,
                len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpeish_tokens,
                CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_tokens
         FROM documents""",
    "mm_wav_frames" ->
      """SELECT doc_id,
                CAST(ceil(octet_length(encode(text)) / 25.0) AS BIGINT) AS n_frames,
                CAST(octet_length(encode(text)) * 2 AS BIGINT) AS frame_bytes
         FROM documents""",
    "mm_meta" ->
      """SELECT doc_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                ascii(text) AS magic,
                CAST(octet_length(encode(text)) // 100 AS BIGINT) AS n_frames,
                'txt' AS format
         FROM documents""",
    "mm_wav_decode" ->
      """SELECT doc_id,
                CAST(16000 AS INT) AS sample_rate,
                CAST(1 AS INT) AS channels,
                CAST(16 AS INT) AS bits_per_sample,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_samples
         FROM documents""",
    // binaryFile ingestion of the staged id range — same closed form
    "src_binaryfile_media" ->
      """SELECT doc_id,
                CAST(8 + doc_id % 13 AS INT) AS width,
                CAST(8 + doc_id % 7 AS INT) AS height,
                CAST((8 + doc_id % 13) * (8 + doc_id % 7) AS BIGINT) AS n_pixels,
                CAST(doc_id % 256 AS DOUBLE) AS mean_red
         FROM documents WHERE doc_id < 100""",
    // closed-form geometry + lossless content round-trip (see the gate)
    "mm_png_decode" ->
      """SELECT doc_id,
                CAST(8 + doc_id % 13 AS INT) AS width,
                CAST(8 + doc_id % 7 AS INT) AS height,
                CAST((8 + doc_id % 13) * (8 + doc_id % 7) AS BIGINT) AS n_pixels,
                CAST(doc_id % 256 AS DOUBLE) AS mean_red
         FROM documents""",
    // floor-halved geometry; uniform gray survives any resize kernel
    "mm_image_resize" ->
      """SELECT doc_id,
                CAST((8 + doc_id % 13) // 2 AS INT) AS width,
                CAST((8 + doc_id % 7) // 2 AS INT) AS height,
                CAST(((8 + doc_id % 13) // 2) * ((8 + doc_id % 7) // 2) AS BIGINT) AS n_pixels,
                CAST(doc_id % 256 AS DOUBLE) AS mean_red
         FROM documents""",
    "mm_jpeg_decode" ->
      """SELECT doc_id,
                CAST(8 + doc_id % 13 AS INT) AS width,
                CAST(8 + doc_id % 7 AS INT) AS height,
                CAST((8 + doc_id % 13) * (8 + doc_id % 7) AS BIGINT) AS n_pixels,
                true AS red_close
         FROM documents""",
    "q_time_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
                COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "s4_stream_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
                COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "s5_stream_sliding" ->
      """SELECT time_bucket(INTERVAL '30 minutes', ts) - o.off AS window_start, event_type,
                COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events,
              (VALUES (INTERVAL '0 minutes'), (INTERVAL '30 minutes')) o(off)
         GROUP BY 1, 2""",
    "s5_stream_session" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
              m AS (SELECT user_id, us,
                           CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                                  OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 7200000000
                                THEN 1 ELSE 0 END AS new_s
                    FROM e),
              s AS (SELECT user_id, us,
                           SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                            ROWS UNBOUNDED PRECEDING) AS sid
                    FROM m)
         SELECT user_id, MIN(us) AS session_start_us, COUNT(*) AS n_events
         FROM s GROUP BY user_id, sid""",
    "s8_stream_static_join" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment
         FROM events e JOIN customer c ON e.user_id = c.c_custkey""",
    "s6_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""",
    // the outer form: every click exactly as in the inner join PLUS one
    // NULL-purchase row per unmatched click (the sentinel flush rows never
    // reach the output — they stay in state, see the gate)
    "s12_stream_outer_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""",
    // existence semantics: one row per converted click, sentinels excluded
    // by the EXISTS itself (disjoint user ids can never match)
    "s17_stream_semi_join" ->
      """SELECT c.user_id, c.event_id AS click_id
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         WHERE EXISTS (SELECT 1 FROM events p
                       WHERE p.event_type = 'purchase'
                         AND p.user_id = c.user_id
                         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)""",
    // the full-outer twin: both unmatched directions survive as NULLs
    "s15_stream_full_outer" ->
      """SELECT coalesce(c.user_id, p.user_id) AS user_id,
                c.event_id AS click_id, p.event_id AS purchase_id
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""",
    "q_asof_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
                p.event_id AS purchase_id,
                epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id AND c.ts >= p.ts""",
    "q_asof_left" ->
      """SELECT c.event_id AS click_id, c.user_id,
                p.event_id AS purchase_id,
                epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id AND c.ts >= p.ts""",
    // foreachBatch is a sink mechanism, result-invariant: plain filter SQL
    "s16_stream_foreach_batch" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE event_type IN ('click', 'purchase')""",
    // same islands sessionization, same RANGE running-min qualification
    "pipe_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
            m AS (SELECT user_id, event_type, us,
                         CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                                OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 7200000000
                              THEN 1 ELSE 0 END AS new_s
                  FROM e),
            s AS (SELECT user_id, event_type, us,
                         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                          ROWS UNBOUNDED PRECEDING) AS sid
                  FROM m),
            f AS (SELECT user_id, sid, event_type, us,
                         MIN(CASE WHEN event_type = 'view' THEN us END)
                           OVER (PARTITION BY user_id, sid ORDER BY us
                                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
                  FROM s),
            g AS (SELECT *, CASE WHEN event_type = 'click' AND fv IS NOT NULL
                                 THEN us END AS qc
                  FROM f),
            h AS (SELECT *, MIN(qc) OVER (PARTITION BY user_id, sid ORDER BY us
                                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fc
                  FROM g),
            i AS (SELECT *, CASE WHEN event_type = 'purchase' AND fc IS NOT NULL
                                 THEN us END AS qp
                  FROM h),
            p AS (SELECT user_id, sid,
                         MAX(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS s1,
                         MAX(CASE WHEN qc IS NOT NULL THEN 1 ELSE 0 END) AS s2,
                         MAX(CASE WHEN qp IS NOT NULL THEN 1 ELSE 0 END) AS s3
                  FROM i GROUP BY user_id, sid)
         SELECT COUNT(*) AS n_sessions,
                CAST(SUM(s1) AS BIGINT) AS reached_view,
                CAST(SUM(s2) AS BIGINT) AS reached_click,
                CAST(SUM(s3) AS BIGINT) AS reached_purchase
         FROM p""",
    "q_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
              m AS (SELECT user_id, us,
                           CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                                  OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 7200000000
                                THEN 1 ELSE 0 END AS new_s
                    FROM e),
              s AS (SELECT user_id, us,
                           SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                            ROWS UNBOUNDED PRECEDING) AS sid
                    FROM m)
         SELECT user_id, MIN(us) AS session_start_us, COUNT(*) AS n_events
         FROM s GROUP BY user_id, sid""",
    "q_window_rank" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, rn FROM (
           SELECT l_orderkey, l_linenumber, l_extendedprice,
                  ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                     ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
           FROM lineitem) WHERE rn <= 2""",
    // unique total order => rank == row_number; pr/cd are exact int ratios
    "q_window_dist" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
                CAST(ntile(4) OVER w AS INT) AS quartile,
                percent_rank() OVER w AS pr,
                cume_dist() OVER w AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey ASC)""",
    // binning + first-shared-bin dedup are result-invariant: plain
    // overlap predicate
    "q_interval_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
          AND epoch_us(c.ts) <= epoch_us(p.ts) + 900000000
          AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000""",
    "q_window_lag" ->
      """SELECT user_id, event_id,
                lag(value) OVER w AS prev_value,
                lead(value) OVER w AS next_value,
                value - lag(value) OVER w AS delta,
                first_value(event_type) OVER w AS first_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "q_array_funcs" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         SELECT doc_id,
                CAST(len(list_filter(w, x -> length(x) > 4)) AS INT) AS n_long_tokens,
                CAST(list_max(list_transform(w, x -> length(x))) AS INT) AS max_token_len,
                CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS total_token_chars,
                CAST(len(list_distinct(w)) AS INT) AS n_distinct_tokens,
                list_sort(list_distinct(w))[1] AS first_token_sorted
         FROM s""",
    "q_window_running" ->
      """SELECT user_id, event_id, value,
                CAST(SUM(CAST(value AS DECIMAL(18,2)))
                     OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS running_value
         FROM events""",
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "j_salted_skew" ->
      """SELECT l_orderkey, l_linenumber, o_totalprice
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_totalprice > 400000.0""",
    // the Bloom sketch is result-invariant: plain EXISTS semantics
    "j_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                              WHERE o_totalprice > 400000.0)""",
    "j_bloom_anti" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_orderkey = l_orderkey
                             AND o_totalprice > 400000.0)""",
    // bucketing is a layout property, result-invariant: plain join SQL
    "j_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                  AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority""",
    // partitioned layout is result-invariant: plain filter SQL
    "src_partitioned_scan" ->
      """SELECT event_id, user_id, value, event_type FROM events
         WHERE event_type = 'click'""",
    "q_join_left" ->
      """SELECT p_partkey, l_orderkey, l_quantity FROM part
         LEFT JOIN lineitem ON p_partkey = l_partkey AND l_quantity >= 49.0""",
    "q_join_full" ->
      """SELECT p_partkey, l_orderkey, l_quantity FROM part
         FULL JOIN (SELECT * FROM lineitem WHERE l_quantity >= 49.0) l
           ON p_partkey = l_partkey""",
    "q_sliding_window" ->
      """SELECT time_bucket(INTERVAL '30 minutes', ts) - o.off AS window_start, event_type,
                COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events,
              (VALUES (INTERVAL '0 minutes'), (INTERVAL '30 minutes')) o(off)
         GROUP BY 1, 2""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_intersect" ->
      """SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.0
         INTERSECT
         SELECT l_partkey FROM lineitem WHERE l_quantity <= 2.0""",
    "q_intersect_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.0
         INTERSECT ALL
         SELECT l_partkey FROM lineitem WHERE l_quantity <= 2.0""",
    "q_except_all" ->
      """SELECT l_partkey FROM lineitem
         EXCEPT ALL
         SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'""",
    "q_except" ->
      """SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.0
         EXCEPT
         SELECT l_partkey FROM lineitem WHERE l_quantity <= 2.0""",
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
                upper(o_orderpriority) AS prio_upper,
                substr(o_orderpriority, 1, 1) AS prio_code,
                length(o_orderstatus) AS status_len,
                concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
                CAST(year(o_orderdate) AS INT) AS order_year,
                CAST(month(o_orderdate) AS INT) AS order_month,
                CAST(day(o_orderdate) AS INT) AS order_day,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) - CAST(100000.0 AS DECIMAL(18,2)) AS DOUBLE) AS delta,
                abs(CAST(CAST(o_totalprice AS DECIMAL(18,2)) - CAST(100000.0 AS DECIMAL(18,2)) AS DOUBLE)) AS abs_delta,
                greatest(o_custkey, o_orderkey) AS max_key
         FROM orders WHERE o_orderkey <= 1000""",
    "q_pivot" ->
      """SELECT l_returnflag,
                COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
                COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_o
         FROM lineitem GROUP BY l_returnflag""",
    "q_unpivot" ->
      """WITH src AS (SELECT l_orderkey, l_linenumber, l_quantity,
                             l_extendedprice, l_discount, l_tax
                      FROM lineitem WHERE l_orderkey < 1000)
         UNPIVOT src ON l_quantity, l_extendedprice, l_discount, l_tax
         INTO NAME metric VALUE value""",
    "q_collect_list" ->
      """SELECT user_id,
                array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
                COUNT(*) AS n_events
         FROM events GROUP BY user_id""",
    "q_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.25) AS p25,
                quantile_cont(l_quantity, 0.5) AS p50,
                quantile_cont(l_quantity, 0.75) AS p75
         FROM lineitem GROUP BY l_returnflag""",
    // sketch rank-contract booleans are constants; the exact interpolated
    // percentiles hash-verify (same quantile_cont parity as q_percentile)
    "q_approx_percentile" ->
      """SELECT quantile_cont(l_quantity, 0.5) AS exact_p50,
                quantile_cont(l_quantity, 0.9) AS exact_p90,
                true AS p50_rank_ok, true AS p90_rank_ok
         FROM lineitem""",
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice >= 0.9 * (SELECT MAX(o_totalprice) FROM orders)""",
    "q_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
                COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    // bit-exact: thresholds are floor(1e6 * sqrt(nmin/cnt)) and IEEE sqrt
    // is correctly rounded in both engines (see Corpus.temperatureSample)
    "corpus_temperature_sample" ->
      """WITH d AS (SELECT doc_id,
                      CASE WHEN CAST(substr(source, 4) AS INT) < 12 THEN 'big'
                           WHEN CAST(substr(source, 4) AS INT) < 18 THEN 'mid'
                           ELSE 'small' END AS tier
                    FROM documents),
              c AS (SELECT tier, COUNT(*) AS cnt FROM d GROUP BY 1),
              m AS (SELECT MIN(cnt) AS nmin FROM c),
              t AS (SELECT tier,
                      CAST(floor(1000000.0 * sqrt(CAST(nmin AS DOUBLE) / CAST(cnt AS DOUBLE))) AS BIGINT) AS thr
                    FROM c, m)
         SELECT d.doc_id, d.tier FROM d JOIN t USING (tier)
         WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT % 1000000 < thr""",
    // items are unique per token row, so exact distinct = token count; the
    // sketch invariants are deterministic constants (see the gate comment)
    "q_hll_distinct" ->
      """SELECT lang, COUNT(*) AS n_exact, true AS est_ok, true AS merge_ok
         FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
         GROUP BY lang""",
    "text_count_min" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
         SELECT term, COUNT(*) AS cnt, true AS ge_ok, true AS within_ok
         FROM tok GROUP BY term""",
    "text_c4_clean" -> c4CleanOracleSql,
    "s13_stream_c4_clean" -> c4CleanOracleSql,
    // replay of repStagedDocs (6-word lines + first line re-appended
    // md5%4 times) then the same (doc, line) grouped counts; fractions
    // are the identical single int→double divisions
    "text_dup_lines" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
              c AS (SELECT doc_id, toks,
                           CAST(ceil(len(toks) / 6.0) AS INT) AS nl FROM t),
              x AS (SELECT doc_id, toks, unnest(range(0, nl)) AS i FROM c),
              ln AS (SELECT doc_id, i,
                       array_to_string(toks[i*6+1 : i*6+6], ' ') AS line FROM x),
              base AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS btext
                       FROM ln GROUP BY doc_id),
              stage AS (SELECT b.doc_id,
                          b.btext || repeat(chr(10) || array_to_string(t.toks[1:6], ' '),
                            CAST(('0x' || substr(md5('dup#' || CAST(b.doc_id AS VARCHAR)), 1, 8))::UBIGINT % 4 AS INT)) AS text
                        FROM base b JOIN t ON b.doc_id = t.doc_id),
              l2 AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM stage),
              g AS (SELECT doc_id, line, COUNT(*) AS n FROM l2 GROUP BY doc_id, line)
         SELECT doc_id,
                CAST(SUM(n) AS BIGINT) AS n_lines,
                CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_lines,
                CAST(SUM(n) - COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_line_frac,
                CAST(SUM((n - 1) * length(line)) AS DOUBLE) / CAST(SUM(n * length(line)) AS DOUBLE) AS dup_char_frac
         FROM g GROUP BY doc_id""",
    // per-doc arg-max via row_number (cnt DESC, gram ASC) — reaches the
    // same deterministic row as Spark's min(struct(-cnt, gram)) partial
    // agg; coverage is the identical integer product and single division
    "text_ngram_coverage" ->
      """WITH t AS (SELECT doc_id, length(text) AS doc_chars,
                           string_split(text, ' ') AS toks FROM documents),
              g AS (SELECT doc_id, doc_chars, 2 AS n,
                      unnest([ array_to_string(toks[i : i+1], ' ')
                               for i in range(1, len(toks)) ]) AS gram
                    FROM t WHERE len(toks) >= 2
                    UNION ALL
                    SELECT doc_id, doc_chars, 3 AS n,
                      unnest([ array_to_string(toks[i : i+2], ' ')
                               for i in range(1, len(toks) - 1) ]) AS gram
                    FROM t WHERE len(toks) >= 3),
              c AS (SELECT doc_id, doc_chars, n, gram, COUNT(*) AS cnt
                    FROM g GROUP BY doc_id, doc_chars, n, gram),
              r AS (SELECT doc_id, doc_chars, n, gram, cnt,
                      row_number() OVER (PARTITION BY doc_id, n
                                         ORDER BY cnt DESC, gram ASC) AS rk
                    FROM c)
         SELECT doc_id, n, gram AS top_gram, CAST(cnt AS BIGINT) AS top_count,
                CAST(cnt * length(gram) AS DOUBLE) / CAST(doc_chars AS DOUBLE) AS top_char_frac
         FROM r WHERE rk = 1""",
    // dedup keys include the hour bucket, so within-watermark dedup is
    // exactly DISTINCT (intra-key event-time span 0 < the 2 h delay)
    "s14_stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type,
                time_bucket(INTERVAL '1 hour', ts) AS hr
         FROM events""",
    // hashed unigram+bigram buckets, Laplace-smoothed target/raw
    // log-ratio per bucket (integer-exact products, one divide, one ln),
    // per-doc sum — op-for-op the Spark pipeline
    "corpus_dsir_weights" ->
      """WITH t AS (SELECT doc_id, (source = 'src0') AS is_target,
                           string_split(text, ' ') AS toks FROM documents),
              uni AS (SELECT doc_id, is_target, unnest(toks) AS gram FROM t),
              bi AS (SELECT doc_id, is_target,
                       unnest([ toks[i] || ' ' || toks[i+1] for i in range(1, len(toks)) ]) AS gram
                     FROM t WHERE len(toks) >= 2),
              g AS (SELECT doc_id, is_target, gram,
                      CAST(('0x' || substr(md5(gram), 1, 8))::UBIGINT % 1024 AS INT) AS b
                    FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
              bc AS (SELECT b, COUNT(*) AS cr,
                       SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct
                     FROM g GROUP BY b),
              tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM bc),
              lr AS (SELECT b, ln((CAST(ct + 1 AS DOUBLE) * (tr + 1024)) /
                                  (CAST(cr + 1 AS DOUBLE) * (tt + 1024))) AS lw
                     FROM bc, tot)
         SELECT g.doc_id AS doc_id, g.is_target AS is_target,
                CAST(COUNT(*) AS BIGINT) AS n_grams, SUM(lw) AS log_w
         FROM g JOIN lr ON g.b = lr.b
         GROUP BY g.doc_id, g.is_target""",
    "text_gopher_rules" ->
      """WITH b AS (SELECT doc_id,
                      len(string_split(text, ' ')) AS n_words,
                      length(text) AS n_chars,
                      len(list_filter(string_split(text, ' '),
                                      w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
                      len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS n_stop
                    FROM documents)
         SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
                CAST(n_stop AS BIGINT) AS n_stop,
                (n_words >= 50 AND n_words <= 100000) AS wc_ok,
                (CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) >= 3.0 AND
                 CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) <= 10.0) AS mwl_ok,
                (5 * n_alpha_words >= 4 * n_words) AS alpha_ok,
                (n_stop >= 2) AS stop_ok,
                ((n_words >= 50 AND n_words <= 100000) AND
                 (CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) >= 3.0 AND
                  CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) <= 10.0) AND
                 (5 * n_alpha_words >= 4 * n_words) AND (n_stop >= 2)) AS pass
         FROM b""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                  AS sum_disc_price,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
                COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus"""
  )
}
