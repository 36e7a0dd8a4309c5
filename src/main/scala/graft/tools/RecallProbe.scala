package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** ANN recall at scale (r14 verdict #5): the sim_lsh_recall /
  * sim_ivf_topk gates prove recall mechanics on 10-query fixtures; this
  * probe measures recall@k for the IVF and LSH top-k paths on the
  * GenScale-staged sf1 embeddings corpus (20k × 64d at factor 10)
  * against the brute-force ranking over a larger sampled query set, and
  * PINS (recall, runtime) the way sf1 growth is pinned.
  *
  * Reading the numbers: the staged embeddings are ISOTROPIC unit
  * vectors (no cluster structure), the adversarial case for ANN — a
  * single-table sign-LSH with p planes finds an angle-θ neighbor with
  * probability (1 − θ/π)^p, so its absolute recall here is LOW by
  * geometry, not by defect (production corpora have cluster structure;
  * the banded multi-table forms in cosinePairsLsh exist precisely
  * because single-table recall decays like this). The pin's job is
  * REGRESSION DETECTION in the candidate machinery: recall dropping
  * below (pinned − 0.05) or runtime growth beyond 1.5× flags.
  *
  * usage: runMain graft.tools.RecallProbe [sf1Dir] [nQueries] [k]
  * SPARK_GRAFT_REFRESH_RECALL=1 re-pins (required after GenScale changes).
  */
object RecallProbe {
  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val nQ = if (args.length > 1) args(1).toInt else 50
    val k = if (args.length > 2) args(2).toInt else 10
    val refresh = sys.env.get("SPARK_GRAFT_REFRESH_RECALL").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.sessionBuilder(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = emb.count()
    val queries = emb.where(col("vec_id") < nQ)

    def timed(fn: => DataFrame): (DataFrame, Double) = {
      val t0 = System.nanoTime()
      val df = fn
      val out = df.cache()
      out.count()
      (out, (System.nanoTime() - t0) / 1e9)
    }

    val (brute, bruteSec) = timed(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k))
    val truth = brute.select(col("query_id"), col("neighbor_id"))

    def recallOf(approx: DataFrame): Double = {
      // average over queries of |approx ∩ brute| / k — queries whose
      // approx set is EMPTY still divide by k (they contribute 0)
      val hit = truth.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).groupBy(col("query_id"))
        .agg(count(lit(1)).as("hits"))
      val totalHits = hit.agg(sum(col("hits"))).head().getLong(0)
      totalHits.toDouble / (nQ.toLong * k)
    }

    // the two IVF settings share ONE registered index build (the
    // production shape — the index is built once, probed at any nprobe),
    // so the per-method timings measure the PROBE, not k-means training
    val ivfKey = Some(s"recallprobe#$dir")
    val methods = Seq(
      ("ivf_n64_p8", () => Similarity.ivfTopK(emb, queries, "vec_id",
        "embedding", k, nlist = 64, nprobe = 8, indexKey = ivfKey)),
      ("ivf_n64_p4", () => Similarity.ivfTopK(emb, queries, "vec_id",
        "embedding", k, nlist = 64, nprobe = 4, indexKey = ivfKey)),
      ("lsh_p4", () => Similarity.lshTopK(emb, queries, "vec_id",
        "embedding", k, nPlanes = 4)),
      ("lsh_p8", () => Similarity.lshTopK(emb, queries, "vec_id",
        "embedding", k, nPlanes = 8)))

    val results = methods.map { case (name, fn) =>
      val (df, sec) = timed(fn())
      val r = recallOf(df)
      df.unpersist()
      System.err.println(f"[recall] $name recall@$k = $r%.4f in $sec%.2fs " +
        f"(brute $bruteSec%.2fs)")
      (name, r, sec)
    }
    brute.unpersist(); emb.unpersist()

    val baseFile = new java.io.File("RECALL_sf1.json")
    val base: Map[String, (Double, Double)] =
      if (baseFile.isFile) {
        val txt = scala.io.Source.fromFile(baseFile).mkString
        """"([A-Za-z0-9_]+)":\{"recall":([0-9.Ee+-]+),"sec":([0-9.Ee+-]+)""".r
          .findAllMatchIn(txt)
          .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble))
          .toMap
      } else Map.empty
    var flags = List.empty[String]
    if (base.nonEmpty && !refresh) {
      results.foreach { case (name, r, sec) =>
        base.get(name).foreach { case (br, bs) =>
          if (r < br - 0.05) {
            flags ::= s"$name recall ${num(r)} < pinned ${num(br)} - 0.05"
            System.err.println(s"[recall] FLAG ${flags.head}")
          }
          if (bs > 0 && sec / bs > 2.0)
            System.err.println(f"[recall] runtime note: $name ${sec}%.2fs vs " +
              f"pinned ${bs}%.2fs (machine-dependent — growth not normalized)")
        }
      }
    }
    val body = results.map { case (nm, r, s) =>
      s""""$nm":{"recall":${num(r)},"sec":${num(s)}}""" }.mkString(",")
    val json = s"""{"metric":"recall","dir":"$dir","n_vectors":$n,""" +
      s""""n_queries":$nQ,"k":$k,"brute_sec":${num(bruteSec)},""" +
      s""""flags":${flags.map(f => "\"" + f + "\"").mkString("[", ",", "]")},""" +
      s""""methods":{$body}}"""
    val outFile = if (base.isEmpty || refresh) baseFile
      else new java.io.File("RECALL_RUN_sf1.json")
    java.nio.file.Files.write(outFile.toPath,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
    if (flags.nonEmpty) sys.exit(1)
  }
}
