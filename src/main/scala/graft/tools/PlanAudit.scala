package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: print `explain("formatted")` for named queries (or audit
  * invariants over all of them with `scan`). Not part of the driver
  * contract.
  *
  * usage: runMain graft.tools.PlanAudit <name>[,name...] [sfDir]
  *        runMain graft.tools.PlanAudit scan [sfDir]   // invariant sweep
  *
  * The `scan` mode checks every BATCH query's physical plan for the
  * anti-patterns the round briefs grade on: CartesianProduct /
  * BroadcastNestedLoopJoin in a hot path and single-partition Exchange
  * (a global window/sort reducing to one task).
  *
  * Reading the report: two hit classes are EXPECTED and benign —
  * (1) `BroadcastNestedLoopJoin Cross BuildRight` where the build side is
  * a broadcast of a bounded table (the sim_* query/centroid sets, global
  * corpus-stat single rows joined onto every group); (2) `Exchange
  * SinglePartition` feeding the FINAL HashAggregate of a global aggregate
  * or a scalar subquery — a handful of partial-aggregate rows, not data.
  * The real tripwires are CartesianProduct anywhere, a WINDOW over
  * SinglePartition (CorpusSpec asserts none), or a BNLJ whose build side
  * scales with the corpus. The r10 sweep: zero CartesianProduct; every
  * BNLJ/SinglePartition hit audited into one of the benign classes.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanAudit <name>[,name...]|scan [sfDir]")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.SparkEntry.sessionBuilder(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // streaming + staging gates execute a query to build their result;
    // their plans are audited via their batch twins instead
    val skip = (n: String) => n.contains("stream") || n.startsWith("mm_") ||
      n == "s6_sink_roundtrip" || n.startsWith("src_")
    if (args(0) == "scan") {
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
    } else {
      args(0).split(",").foreach { name =>
        val fn = graft.SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query '$name'"))
        println(s"===== $name =====")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
