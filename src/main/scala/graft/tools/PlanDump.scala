package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev harness: write `.explain("formatted")` for named `SparkEntry.queries`
  * entries to files — the optimization-round evidence trail
  * (`plans/r<N>/<query>_<tag>.txt`). Not part of the driver contract.
  *
  * usage: runMain graft.tools.PlanDump <outDir> <tag> <q1,q2,...> [sfDir]
  *
  * Plans are captured WITHOUT executing the query (explain only), on the
  * same session shape as the bench (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus). Streaming gates execute their stream before
  * returning a batch DataFrame over the sink result, so for them the
  * dumped plan is the post-sink read — noted in the file header.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <q1,q2,...> [sfDir]")
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.sessionBuilder(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // validate every name up front (ADVICE r19 #4): a typo'd name used to
    // sys.error mid-loop, leaving a partial plans/ directory while
    // per-query capture failures were annotated in-file — two failure
    // modes in one evidence tool. Now unknown names abort before any
    // file is written.
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — nothing written")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val body =
        try {
          val df = fn(spark, sfDir)
          val qe = df.queryExecution
          qe.explainString(ExplainMode.fromString("formatted"))
        } catch { case e: Throwable =>
          s"PLAN CAPTURE FAILED: ${e.getClass.getName}: ${e.getMessage}"
        }
      val header = s"== $name ($tag, sfDir=$sfDir, explain-formatted) ==\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        (header + body).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
