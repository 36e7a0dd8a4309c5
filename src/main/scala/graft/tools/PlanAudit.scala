package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-signature audit: the 100 TB plan review, mechanized and PINNED.
  *
  * Every round the plan of every batch gate is read for the same
  * anti-patterns (a cartesian product, a join that stopped broadcasting,
  * a filter that stopped reaching the scan, a global single-reducer
  * sort). Timings drift with machine load, but the INITIAL physical plan
  * is a pure function of (code, data statistics at one scale factor) —
  * so unlike the bench, a plan signature can be compared EXACTLY: any
  * drift is a real plan change, never noise.
  *
  * usage: runMain graft.tools.PlanAudit <name>[,name...] [sfDir]  // explain
  *        runMain graft.tools.PlanAudit scan  [sfDir]  // stdout sweep
  *        runMain graft.tools.PlanAudit audit [sfDir]  // write PLAN_AUDIT.json,
  *                                                     // diff vs PLAN_BASELINE.json,
  *                                                     // exit 1 on drift
  *        runMain graft.tools.PlanAudit pin   [sfDir]  // audit + re-pin baseline
  *
  * The signature counts plan-node classes that encode scale posture:
  * exchanges by partitioning (hash / range / single-partition), broadcast
  * exchanges, join strategies (SMJ / BHJ / shuffled-hash / BNLJ /
  * cartesian), TakeOrderedAndProject (top-k without a global sort),
  * whole-stage-codegen span count, and scans vs scans-with-pushed-filters.
  * Node COUNTS, not plan text: expression ids, staged temp paths and
  * statistics annotations vary run to run; the node-class histogram does
  * not.
  *
  * Tripwires enforced regardless of baseline:
  *   - `CartesianProduct` anywhere is an immediate failure (every graft
  *     pair plan is either key-bucketed or broadcast-bounded by design);
  *   - a gate erroring during plan construction is a failure.
  * Everything else is drift-vs-baseline: BNLJ and single-partition
  * exchanges have adjudicated-benign instances (a broadcast of a bounded
  * query/centroid set; the final reduce of a global aggregate — see the
  * r10 sweep notes in PLANS.md), so their counts are pinned rather than
  * forbidden: a NEW instance shows up as a +1 against the baseline and
  * must be re-adjudicated.
  *
  * Streaming / binary-media / file-roundtrip gates are excluded: their
  * `queries()` entries EXECUTE a query (memory-sink materialization,
  * staged side effects) to produce the returned frame, so the audited
  * plan would be the trivial post-materialization read. Their batch twins
  * cover the same operator plans (COVERAGE.md maps each).
  *
  * The baseline records its sfDir: statistics (file sizes) feed join
  * strategy, so signatures are only comparable at the SAME scale factor.
  * PLAN_BASELINE.json is pinned at sf0.01 — the driver's correctness SF.
  */
object PlanAudit {

  /** (json key, count function over the executed-plan string). Counting
    * functions use literal node-class markers from SparkPlan.toString —
    * stable across runs, independent of expression ids. */
  private val features: Seq[(String, String => Int)] = {
    def count(needle: String)(p: String): Int = {
      var n = 0; var i = p.indexOf(needle)
      while (i >= 0) { n += 1; i = p.indexOf(needle, i + needle.length) }
      n
    }
    Seq(
      "exchange_hash" -> count("Exchange hashpartitioning") _,
      "exchange_range" -> count("Exchange rangepartitioning") _,
      "exchange_single" -> count("Exchange SinglePartition") _,
      "broadcast_exchange" -> count("BroadcastExchange") _,
      "cartesian" -> count("CartesianProduct") _,
      "bnlj" -> count("BroadcastNestedLoopJoin") _,
      "sort_merge_join" -> count("SortMergeJoin") _,
      "broadcast_hash_join" -> count("BroadcastHashJoin") _,
      "shuffled_hash_join" -> count("ShuffledHashJoin") _,
      "take_ordered" -> count("TakeOrderedAndProject") _,
      // distinct whole-stage-codegen span ids: nodes inside a span print
      // with a "*(id)" prefix; the span count is how WIDE codegen reaches
      "codegen_spans" -> ((p: String) =>
        "\\*\\((\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSet.size),
      // parquet file scans + DSv2 batch scans (the graft connector)
      "scans" -> ((p: String) => count("FileScan parquet")(p) + count("BatchScan")(p)),
      // scans whose pushed-filter list is NON-empty — predicate pushdown
      // actually reaching the source
      "scans_pushed" -> ((p: String) => count("PushedFilters: [")(p) -
        count("PushedFilters: []")(p)))
  }

  private def signature(plan: String): Seq[(String, Int)] =
    features.map { case (k, f) => k -> f(plan) }

  /** Per-SF artifact names, trailing-slash-safe: sf0.01 keeps the legacy
    * names; any other scale factor gets a _<tag> suffix. One helper for
    * BOTH the audit and baseline paths so they cannot diverge. */
  private def sfTag(sfDir: String): String =
    sfDir.reverse.dropWhile(_ == '/').reverse.split("/").last
  private def artifact(prefix: String, sfDir: String): String =
    if (sfTag(sfDir) == "sf0.01") s"$prefix.json"
    else s"${prefix}_${sfTag(sfDir).replace('.', '_')}.json"

  /** streaming + staging gates execute a query to build their result;
    * their operator plans are audited via their batch twins instead. */
  private def skip(n: String): Boolean =
    n.contains("stream") || n.startsWith("mm_") ||
      n == "s6_sink_roundtrip" || n.startsWith("src_")

  private def renderJson(sfDir: String,
      sigs: Seq[(String, Either[String, Seq[(String, Int)]])]): String = {
    val sb = new StringBuilder
    sb.append("{\n  \"sf_dir\": \"").append(sfDir).append("\",\n  \"gates\": {\n")
    sigs.zipWithIndex.foreach { case ((name, sig), i) =>
      sb.append("    \"").append(name).append("\": ")
      sig match {
        case Left(err) =>
          // truncate BEFORE escaping — truncating after could split a
          // two-char escape and leave a lone trailing backslash, making
          // the written file invalid JSON
          sb.append("{\"error\": \"")
            .append(err.take(160)
              .replace("\\", "\\\\").replace("\"", "\\\"")
              .map(c => if (c < ' ') ' ' else c).mkString)
            .append("\"}")
        case Right(kvs) =>
          sb.append(kvs.map { case (k, v) => s""""$k": $v""" }
            .mkString("{", ", ", "}"))
      }
      sb.append(if (i < sigs.length - 1) ",\n" else "\n")
    }
    sb.append("  }\n}\n")
    sb.toString
  }

  /** Tolerant line parser for the files THIS tool writes (one gate per
    * line) — no external JSON dependency in main. The gate pattern is
    * anchored to the 4-space indent renderJson emits, so the outer
    * `"gates": {` wrapper (which would otherwise swallow the first
    * gate's counts under the key "gates") can never match. */
  private def parseGates(text: String): (String, Map[String, Map[String, Int]]) = {
    val sf = "\"sf_dir\": \"([^\"]*)\"".r.findFirstMatchIn(text)
      .map(_.group(1)).getOrElse("")
    val gate = "(?m)^    \"([A-Za-z0-9_]+)\": \\{([^}]*)\\}".r
    val kv = "\"([a-z_]+)\": (-?\\d+)".r
    val m = gate.findAllMatchIn(text).map { g =>
      g.group(1) -> kv.findAllMatchIn(g.group(2))
        .map(x => x.group(1) -> x.group(2).toInt).toMap
    }.toMap
    (sf, m)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: PlanAudit <name>[,name...]|scan|audit|pin [sfDir]")
    val mode = args(0)
    val sfDir = if (args.length > 1) args(1)
      else if (mode == "audit" || mode == "pin") "/root/testdata/sf0.01"
      else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.SparkEntry.sessionBuilder(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    mode match {
      case "scan" =>
        graft.SparkEntry.queries.toSeq.sortBy(_._1)
          .filterNot { case (n, _) => skip(n) }
          .foreach { case (name, fn) =>
            try {
              val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
              val bad = Seq(
                "CartesianProduct" -> plan.contains("CartesianProduct"),
                "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
                "SinglePartition" -> plan.contains("Exchange SinglePartition"))
                .collect { case (tag, true) => tag }
              if (bad.nonEmpty) println(s"[planaudit] $name: ${bad.mkString(", ")}")
            } catch { case e: Throwable =>
              println(s"[planaudit] $name: ERROR ${e.getMessage.take(120)}")
            }
          }
        println("[planaudit] scan complete")

      case "audit" | "pin" =>
        val sigs: Seq[(String, Either[String, Seq[(String, Int)]])] =
          graft.SparkEntry.queries.toSeq.sortBy(_._1)
            .filterNot { case (n, _) => skip(n) }
            .map { case (name, fn) =>
              val sig =
                try Right(signature(
                  fn(spark, sfDir).queryExecution.executedPlan.toString))
                catch { case e: Throwable =>
                  Left(String.valueOf(e.getMessage)) }
              spark.catalog.clearCache()
              name -> sig
            }
        val auditJson = renderJson(sfDir, sigs)
        val auditPath = artifact("PLAN_AUDIT", sfDir)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(auditPath), auditJson)
        println(s"[planaudit] wrote $auditPath (${sigs.size} gates)")

        var failures = List.empty[String]
        sigs.foreach {
          case (n, Left(err)) => failures ::= s"$n: plan construction ERROR $err"
          case (n, Right(kvs)) =>
            val cart = kvs.collectFirst { case ("cartesian", v) => v }.getOrElse(0)
            if (cart > 0) failures ::= s"$n: CartesianProduct in plan (tripwire)"
        }

        // per-SF baselines: statistics feed join strategy, so each scale
        // factor pins its own signature file — sf0.01 keeps the legacy
        // name; the sf0.1 twin answers "does the plan HOLD at 10x the
        // data" (a broadcast that flips to SMJ shows up as strategy
        // drift between the two pinned files)
        val basePath = java.nio.file.Paths.get(artifact("PLAN_BASELINE", sfDir))
        if (mode == "pin") {
          // never replace a good baseline with a failed sweep: a wrong
          // sfDir or a tripwired gate must not destroy the committed pin
          if (failures.isEmpty) {
            java.nio.file.Files.writeString(basePath, auditJson)
            println(s"[planaudit] PINNED $basePath")
          } else println("[planaudit] REFUSING to pin: failures below")
        } else if (java.nio.file.Files.exists(basePath)) {
          val (baseSf, base) = parseGates(java.nio.file.Files.readString(basePath))
          def norm(d: String) = d.reverse.dropWhile(_ == '/').reverse
          if (norm(baseSf) != norm(sfDir))
            failures ::= s"baseline pinned at $baseSf, audit ran at $sfDir - not comparable"
          else {
            val (_, cur) = parseGates(auditJson)
            (base.keySet ++ cur.keySet).toSeq.sorted.foreach { g =>
              (base.get(g), cur.get(g)) match {
                case (None, Some(_)) =>
                  println(s"[planaudit] NEW gate $g (no baseline entry) - pin to adopt")
                case (Some(_), None) =>
                  failures ::= s"$g: present in baseline, missing from audit"
                case (Some(b), Some(c)) if b != c =>
                  val diffs = (b.keySet ++ c.keySet).toSeq.sorted.flatMap { k =>
                    val (bv, cv) = (b.getOrElse(k, 0), c.getOrElse(k, 0))
                    if (bv != cv) Some(s"$k $bv->$cv") else None
                  }
                  failures ::= s"$g: plan drift [${diffs.mkString(", ")}]"
                case _ => ()
              }
            }
          }
        } else println(s"[planaudit] no $basePath - run `pin` to create one")

        if (failures.nonEmpty) {
          failures.reverse.foreach(f => println(s"[planaudit] FAIL $f"))
          spark.stop()
          sys.exit(1)
        } else println("[planaudit] clean: no tripwires, no drift")

      case names =>
        names.split(",").foreach { name =>
          val fn = graft.SparkEntry.queries.getOrElse(name,
            sys.error(s"unknown query '$name'"))
          println(s"===== $name =====")
          fn(spark, sfDir).explain("formatted")
        }
    }
    spark.stop()
  }
}
