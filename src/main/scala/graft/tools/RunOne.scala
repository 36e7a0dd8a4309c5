package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run one named `SparkEntry.queries` entry against a testdata
  * dir and print its wall time (and optionally the formatted plan). Not part
  * of the driver contract — exists so a single hotspot can be profiled
  * without paying the full Bench sweep.
  *
  * usage: runMain graft.tools.RunOne <queryName> [sfDir] [explain] [runs=N]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunOne <queryName> [sfDir] [explain] [runs=N]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val explain = args.contains("explain")
    val runs = args.collectFirst { case a if a.startsWith("runs=") =>
      a.stripPrefix("runs=").toInt }.getOrElse(1)
    // warm=<dir>: run once at another scale first (the driver bench warms
    // every query at sf0.001 before timing it at sf0.1 — reproduces the
    // codegen/AQE state the measured run actually sees)
    val warmDir = args.collectFirst { case a if a.startsWith("warm=") =>
      a.stripPrefix("warm=") }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // parts=N: decouple shuffle partitions from thread count — the dial a
    // real cluster sizes to the data (spill adjudication at big SFs)
    val parts = args.collectFirst { case a if a.startsWith("parts=") =>
      a.stripPrefix("parts=") }.getOrElse(cpus)
    val spark = graft.SparkEntry.sessionBuilder(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    warmDir.foreach { wd =>
      val t0 = System.nanoTime()
      val n = fn(spark, wd).count()
      println(f"[runone] $name warm ($wd): $n rows in ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (explain && i == 1) df.explain("formatted")
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[runone] $name run $i: $n rows in $dt%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
