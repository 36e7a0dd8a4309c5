package graft.tools

import org.apache.spark.sql.SparkSession

/** sf1 spot-bench (r11 verdict #6): times the pinned 10 most expensive
  * gates plus the full dedup family at sf0.1 AND at the GenScale-staged
  * sf1 dir in ONE session (growth ratios are therefore machine-
  * independent), with a per-run timeout that cancels the job group so a
  * blown-up candidate space cannot wedge the sweep — a timeout is itself
  * the measurement (the gate does NOT survive the scale-up).
  *
  * Also measures `dedup_containment` BEFORE the r12 prefix filter
  * (containmentPairsBrute, same planted-fragment gate shape) against the
  * shipped form, at both scales.
  *
  * Writes BENCH_SPOT_sf1.json:
  *   {"metric":"spot","gates":{name:{"sf01":s,"sf1":s,"growth":r}},...}
  *
  * usage: runMain graft.tools.SpotBench [sf1Dir] [refDir]
  */
object SpotBench {
  // the 10 most expensive gates of the committed sf0.1 baseline (r11)
  private val top10 = Seq(
    "text_bigram_xent", "corpus_dsir_weights", "dedup_cluster_cc",
    "s15_stream_full_outer", "s12_stream_outer_join", "s17_stream_semi_join",
    "dedup_jaccard_prefix", "t_stream_mem_backpressure", "s20_stream_bpe",
    "dedup_keep_best")
  private val dedupFamily = Seq(
    "dedup_exact", "dedup_normalized", "dedup_paragraphs", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_jaccard_prefix",
    "dedup_jaccard_capped", "dedup_containment", "dedup_edit_distance",
    "dedup_substring", "dedup_substring_capped", "dedup_incremental",
    "dedup_keep_best", "dedup_cluster_cc", "dedup_semantic",
    "dedup_embedding_cosine", "dedup_embedding_cosine_t90")

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sf1Dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val refDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_SPOT_TIMEOUT", "360").toLong
    // SPARK_GRAFT_SPOT_ONLY=a,b,... — run a chunk; results MERGE into the
    // existing BENCH_SPOT_sf1.json so the sweep can run in bounded slices
    val only = sys.env.get("SPARK_GRAFT_SPOT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.sessionBuilder(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the pre-r12 containment form, in the gate's exact planted shape —
    // the "before" of the r11 verdict's scale-killer fix
    val containmentBrute: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = graft.sources.Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val fragments = docs.where(col("doc_id") < 10)
          .select((col("doc_id") + 100000L).as("doc_id"),
            array_join(slice(split(col("text"), " "), 1, 12), " ").as("text"))
        graft.functions.Dedup.containmentPairsBrute(docs.unionByName(fragments),
          "doc_id", "text", shingleLen = 3, threshold = 0.8)
      }

    val allGates: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      (top10 ++ dedupFamily).distinct.map(n => n -> graft.SparkEntry.queries(n)) :+
        ("dedup_containment_brute" -> containmentBrute)
    val gates = only match {
      case Some(names) => allGates.filter { case (n, _) => names(n) }
      case None => allGates
    }

    /** run body with a hard timeout; cancel the job group on expiry.
      * Some(seconds) on success, None on timeout/error (logged). */
    def timed(tag: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Option[Double] = {
      @volatile var failed: Option[String] = None
      val t0 = System.nanoTime()
      val th = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = true)
          fn(spark, dir).count(); ()
        } catch { case e: Throwable => failed = Some(e.getMessage) }
      }, s"spot-$tag")
      th.setDaemon(true)
      th.start()
      th.join(timeoutSec * 1000)
      val out =
        if (th.isAlive) {
          spark.sparkContext.cancelJobGroup(tag)
          th.join(60000)
          System.err.println(s"[spot] $tag TIMEOUT after ${timeoutSec}s")
          None
        } else failed match {
          case Some(msg) =>
            System.err.println(s"[spot] $tag FAILED: $msg"); None
          case None => Some((System.nanoTime() - t0) / 1e9)
        }
      spark.catalog.clearCache()
      out
    }

    // warm every gate shape once at the smallest sf (codegen/JIT)
    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).isDirectory) d else refDir
    }
    gates.foreach { case (n, fn) =>
      try { fn(spark, warmDir).count(); () } catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }

    val results = gates.map { case (name, fn) =>
      // min-of-2 at the reference sf; single timed run at sf1 (the heavy
      // side — a second pass would double a multi-minute measurement)
      val r1 = timed(s"$name@ref1", fn, refDir)
      val r2 = timed(s"$name@ref2", fn, refDir)
      val tRef = (r1.toSeq ++ r2.toSeq).sorted.headOption
      val t1 = timed(s"$name@sf1", fn, sf1Dir)
      val growth = for (a <- tRef; b <- t1) yield b / a
      System.err.println(s"[spot] $name ref=${tRef.map(num)} sf1=${t1.map(num)} " +
        s"growth=${growth.map(g => num(g) + "x")}")
      (name, tRef, t1, growth)
    }
    // merge with any prior chunk's entries (latest run of a gate wins)
    val outFile = new java.io.File("BENCH_SPOT_sf1.json")
    val prior: Seq[(String, String)] =
      if (outFile.isFile) {
        val txt = scala.io.Source.fromFile(outFile).mkString
        """"([A-Za-z0-9_]+)":(\{"sf01":[^}]*\})""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2)).toSeq
      } else Nil
    val fresh = results.map { case (n, tRef, t1, g) =>
      def v(o: Option[Double]) = o.map(num).getOrElse("\"timeout\"")
      n -> s"""{"sf01":${v(tRef)},"sf1":${v(t1)},"growth":${v(g)}}"""
    }
    val merged = (prior.toMap ++ fresh.toMap).toSeq.sortBy(_._1)
    val gatesJson = merged.map { case (n, b) => s""""$n":$b""" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"spot","unit":"sec","timeout_sec":$timeoutSec,""" +
        s""""row_factor":10,"sf1_dir":"$sf1Dir","gates":$gatesJson}"""
    java.nio.file.Files.write(outFile.toPath,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
  }
}
