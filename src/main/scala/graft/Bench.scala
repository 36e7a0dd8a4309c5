package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run EVERY query once at the smallest scale factor (falling
    // back to the benchmarked dir) so whole-stage codegen compilation and
    // JIT warm per QUERY SHAPE before anything is timed — measured runs
    // then time the operators, not first-call compilation, which was the
    // dominant source of ±20% run-to-run variance. Failures are loud.
    val warmDir = {
      val small = "/root/testdata/sf0.001"
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, warmDir).count(); () }
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up of $name failed: ${e.getMessage}") }
      spark.catalog.clearCache()
    }
    // Stable (sorted) execution order: Map iteration order shifts when
    // entries are added, which moves one-time JIT/codegen warmup between
    // queries and makes per-query times incomparable across rounds.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // per-query persists (dedup/LSH signature stages etc.) must not
      // accumulate across the 50+ queries of one session — drop cached
      // blocks after each measurement so later timings aren't skewed
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
