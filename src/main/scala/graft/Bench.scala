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
    // Warm up the session (codegen, filesystem, parquet footer caches)
    // against the BENCHMARKED directory so the first measured query doesn't
    // absorb one-time startup cost; a failed warm-up is loud, not silent.
    try { SparkEntry.queries("j1_join_inner")(spark, sfDir).count(); () }
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed: ${e.getMessage}") }
    spark.catalog.clearCache()
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
