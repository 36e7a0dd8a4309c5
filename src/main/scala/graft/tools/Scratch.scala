package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling scratchpad (not part of the driver contract). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val gates = if (args.length > 1) args(1).split(",").toSeq
      else Seq("dedup_containment")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.sessionBuilder(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    for (mf <- Seq("100", "500", "100", "500")) {
      spark.conf.set("spark.sql.codegen.maxFields", mf)
      gates.foreach { g =>
        qs(g)(spark, sfDir).count(); spark.catalog.clearCache() // warm
        (1 to 2).foreach { i =>
          time(s"$g maxFields=$mf pass$i") { qs(g)(spark, sfDir).count() }
          spark.catalog.clearCache()
        }
      }
    }
    spark.stop()
  }
}
