package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for the jaccard_prefix second-decade
  * residual (r18 verdict #2): times each stage of the prefix pipeline
  * in isolation at a given dir. Not part of the driver contract.
  *
  * usage: runMain graft.tools.ProbePrefix <dir> [threshold]
  */
object ProbePrefix {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val threshold = if (args.length > 1) args(1).toDouble else 0.7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.sessionBuilder(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt(tag: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[probe] $tag%-28s $n%12d rows ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
    }

    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val cap = graft.functions.Dedup.DefaultMaxDocFreq
    val sh = docs.select(col("doc_id"),
      graft.functions.TextOps.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val exploded = sh.select(col("doc_id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s"))
    val dfCounts = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val kept = exploded.join(dfCounts, "s").where(col("df") <= cap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("s").asc)
    val prefix = kept
      .withColumn("pos", row_number().over(w))
      .where(col("pos") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val cand = prefix.alias("a").join(prefix.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    // PPJoin length filter: jaccard >= t forces t*|a| <= |b| <= |a|/t
    // (inter <= min, union >= max => j <= min/max) — lossless
    val prefixSz = kept
      .withColumn("pos", row_number().over(w))
      .where(col("pos") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("sz"), xxhash64(col("s")).as("h"))
    val candLen = prefixSz.alias("a").join(prefixSz.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") * lit(1.0) >= lit(threshold) * col("a.sz") &&
          col("a.sz") * lit(1.0) >= lit(threshold) * col("b.sz"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    // PPJoin positional filter on top of the length filter: a shared
    // prefix occurrence at positions (i,j) bounds the overlap above by
    // 1 + min(sz_a - i, sz_b - j) (everything before i/j in the global
    // order is provably disjoint... no — everything AT OR AFTER the
    // occurrence can still match, the bound counts it); jaccard >= t
    // needs inter >= ceil(t/(1+t) * (sz_a + sz_b)). A pair survives if
    // ANY of its shared prefix occurrences passes — a superset of
    // textbook ppjoin's first-occurrence check, so lossless a fortiori.
    val prefixPos = kept
      .withColumn("pos", row_number().over(w))
      .where(col("pos") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("sz"), col("pos"), xxhash64(col("s")).as("h"))
    val candPp = prefixPos.alias("a").join(prefixPos.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") * lit(1.0) >= lit(threshold) * col("a.sz") &&
          col("a.sz") * lit(1.0) >= lit(threshold) * col("b.sz") &&
          lit(1) + least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")) >=
            ceil(lit(threshold) / (lit(1.0) + threshold) *
              (col("a.sz") + col("b.sz")) - lit(1e-9)))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    timeIt("shingle_explode")(exploded)
    timeIt("df_counts")(dfCounts)
    timeIt("kept_join")(kept)
    timeIt("prefix_window")(prefix)
    timeIt("candidates")(cand)
    timeIt("candidates_lenfilter")(candLen)
    timeIt("candidates_ppjoin")(candPp)
    timeIt("full_operator")(
      graft.functions.Dedup.jaccardPrefixPairs(docs, "doc_id", "text",
        shingleLen = 3, threshold = threshold))
    spark.stop()
  }
}
