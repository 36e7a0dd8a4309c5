package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity, TextOps}

/** SQL function surface (GraftFunctions/GraftExtensions) + the fail-fast
  * contracts of the custom expressions. */
class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table}

  GraftFunctions.registerAll(spark)

  test("word_shingles via SQL matches the column API") {
    table("documents").limit(50).createOrReplaceTempView("docs_v")
    val viaSql = spark.sql(
      "SELECT doc_id, word_shingles(text, 3) AS sh FROM docs_v ORDER BY doc_id")
    val viaCol = table("documents").limit(50)
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
      .orderBy("doc_id")
    assert(viaSql.collect().toSeq === viaCol.collect().toSeq)
  }

  test("xxhash64_mod + minhash_signature via SQL match the column pipeline") {
    table("documents").limit(20).createOrReplaceTempView("docs_mh_v")
    val viaSql = spark.sql(
      """SELECT doc_id,
                minhash_signature(xxhash64_mod(word_shingles(text, 3), 2147483647), 16, 42) AS sig
         FROM docs_mh_v ORDER BY doc_id""")
    val viaCol = table("documents").limit(20)
      .select(col("doc_id"),
        Dedup.minhashSignature(TextOps.shingles(col("text"), 3), 16, 42L).as("sig"))
      .orderBy("doc_id")
    assert(viaSql.collect().toSeq === viaCol.collect().toSeq)
  }

  test("dot_product via SQL matches the column API (and the 2-arity check fires)") {
    table("embeddings").limit(5).createOrReplaceTempView("emb_ext_v")
    val viaSql = spark.sql(
      "SELECT dot_product(embedding, embedding) AS d FROM emb_ext_v ORDER BY vec_id")
      .collect().map(_.getDouble(0)).toSeq
    val viaCol = table("embeddings").orderBy("vec_id").limit(5)
      .select(Similarity.dot(col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql === viaCol)
    val e = intercept[Exception](spark.sql("SELECT dot_product(embedding) FROM emb_ext_v"))
    assert(e.getMessage.contains("exactly 2"))
  }

  test("nfc_normalize + text_signals via SQL match the column API") {
    table("documents").limit(20).createOrReplaceTempView("docs_sig_v")
    val viaSql = spark.sql(
      """SELECT doc_id, nfc_normalize(text) AS nfc, text_signals(text) AS sig
         FROM docs_sig_v ORDER BY doc_id""")
    val viaCol = table("documents").limit(20)
      .select(col("doc_id"),
        graft.functions.TextNormalize.nfc(col("text")).as("nfc"),
        graft.functions.TextAnalysis.signals(col("text")).as("sig"))
      .orderBy("doc_id")
    assert(viaSql.collect().toSeq === viaCol.collect().toSeq)
  }

  test("GraftExtensions injects the same builders (production config path)") {
    // Builders are shared; applying the extension hook must register every
    // function name the ad hoc path registers.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builder list is shared
    assert(GraftFunctions.all.map(_._1.funcName).toSet ===
      Set("dot_product", "word_shingles", "xxhash64_mod", "minhash_signature",
        "nfc_normalize", "text_signals"))
  }

  /** Depending on where the expression evaluates (local relation vs task),
    * the IllegalArgumentException may surface raw or wrapped — either way
    * the query must FAIL with the diagnostic, never truncate silently. */
  private def failureMessage(f: => Any): String = {
    val e = intercept[Exception](f)
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
  }

  test("dot_product fails fast on mismatched vector lengths (oracle parity)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(failureMessage(df.select(Similarity.dot(col("a"), col("b"))).collect())
      .contains("mismatched vector lengths"))
  }

  test("lsh_band_buckets and nearest_cell fail fast on dimension mismatch") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("v")
    assert(failureMessage(
      df.select(graft.expressions.LshFunctions.lsh_band_buckets(
        col("v"), Seq(Seq(1.0, 2.0, 3.0)), 1)).collect())
      .contains("plane dim"))
    assert(failureMessage(
      df.select(graft.expressions.LshFunctions.nearest_cell(
        col("v"), Seq(Seq(0.0, 0.0, 0.0)))).collect())
      .contains("centroid dim"))
  }
}
