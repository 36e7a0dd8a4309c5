package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: dump the WHOLE-STAGE-CODEGEN generated Java for a named
  * query — the evidence tool for "is this operator actually codegen'd,
  * and how is the wide update split into methods" questions (r19 verdict
  * #4). Not part of the driver contract.
  *
  * usage: runMain graft.tools.CodegenDump <outFile> <query> [sfDir]
  */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CodegenDump <outFile> <query> [sfDir]")
    val outFile = args(0)
    val name = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.sessionBuilder(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    // AQE wraps the plan in AdaptiveSparkPlan, whose codegen subtrees only
    // exist after execution — disable it for the dump (an isolated child
    // session); whole-stage codegen itself is orthogonal to AQE.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    val df = fn(ss, sfDir)
    import org.apache.spark.sql.execution.debug._
    val body = df.queryExecution.debug.codegenToSeq().zipWithIndex.map {
      case ((subtree, code, _), i) =>
        s"== subtree $i ==\n$subtree\n-- generated code --\n$code"
    }.mkString("\n\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[codegendump] wrote $outFile (${body.length} chars)")
    spark.stop()
  }
}
