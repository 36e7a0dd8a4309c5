package graft

import org.apache.spark.sql.SparkSession

/** Prints the physical plan of selected `SparkEntry.queries` — the source
  * for PLANS.md's live plan audits. Usage:
  * `runMain graft.PlanAudit [sfDir] [query ...]` (no names = the headline
  * audit set). */
object PlanAudit {
  val defaultSet: Seq[String] = Seq(
    "s1_scan_pushdown", "j1_join_inner", "q1_agg", "q_topk", "q3_shipping",
    "q_asof_join", "dedup_minhash_lsh", "dedup_embedding_cosine",
    "sim_brute_topk", "j2_zipwith", "pipe_clean_corpus", "corpus_pack_budget",
    "corpus_sample_hash", "text_decontaminate", "corpus_mix_weights",
    "pipe_training_corpus", "dedup_incremental",
    "q_range_join", "corpus_source_cap", "text_perplexity")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else defaultSet
    val spark = SparkEntry.sessionBuilder(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name")
      println(df.queryExecution.executedPlan.toString
        .linesIterator.map(_.take(160)).mkString("\n"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
