package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.VectorFunctions.dot_product

/** Similarity search over an embedding column (`array<float>`).
  *
  * Beyond-reference extension. Vector math uses the custom codegen'd
  * [[graft.expressions.DotProduct]] Catalyst expression (primitive loop;
  * the composed `aggregate`/`zip_with` form was measured 8× slower on the
  * all-pairs path). Accumulation is left-to-right in double — bit-compatible
  * with DuckDB's `list_dot_product` on `DOUBLE[]`, which the correctness
  * oracle uses.
  *
  * Scale design:
  *  - brute-force top-k broadcasts the (small) query set and streams the
  *    corpus once — embarrassingly parallel, no shuffle on the corpus side;
  *  - the LSH path buckets by random-hyperplane signs so candidate
  *    generation is an equi-join on bucket id — the 100 TB path where
  *    all-pairs is impossible;
  *  - exact all-pairs (near-dup audit) is quadratic: bounded corpora only.
  *    Norms are computed once per row (linear), never per pair.
  */
object Similarity {

  /** Codegen'd sequential double-precision dot product. */
  def dot(a: Column, b: Column): Column = dot_product(a, b)

  def l2norm(v: Column): Column = sqrt(dot_product(v, v))

  /** cos(a,b) = dot / (|a| * |b|) — same expression shape as the oracle. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Query side is broadcast; ties broken by
    * neighbor id for determinism. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2norm(col(vecCol)).as("cn"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** Deterministic random hyperplanes (seeded) as a nested literal. */
  private def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket id from random hyperplane projections (2^nPlanes buckets).
    * Power-of-two accumulation in double is exact for nPlanes <= 52. */
  def lshBucket(vecCol: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = typedLit(hyperplanes(nPlanes, dim, seed))
    aggregate(
      sequence(lit(0), lit(nPlanes - 1)),
      lit(0.0),
      (acc, j) => acc + when(dot(element_at(planes, j + lit(1)), vecCol) > 0.0,
        pow(lit(2.0), j)).otherwise(lit(0.0))
    ).cast("long")
  }

  /** LSH-bucketed approximate top-k: candidates share a sign bucket with the
    * query; exact cosine ranks within candidates. Trades recall for a
    * shuffle-free-corpus, equi-join-only plan — the scale path. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2norm(col(vecCol)).as("qn"),
      lshBucket(col(vecCol), nPlanes, dim, seed).as("bucket")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2norm(col(vecCol)).as("cn"),
      lshBucket(col(vecCol), nPlanes, dim, seed).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * partitions the corpus into `nlist` cells; each query probes its
    * `nprobe` nearest cells and ranks exact cosine within them.
    *
    * The other classic ANN scale path besides [[lshTopK]]: candidate
    * generation is an equi-join on the cell id, so the corpus is scanned
    * once and shuffled once (by cell). Centroids are tiny driver-side state
    * (nlist × dim) — broadcast implicitly through a literal-free crossJoin
    * of the (small) query set with the (small) centroid table.
    * Training is seeded; on a real cluster you would train on a sample and
    * persist the model like any other index build. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 2,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._

    val featured = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").fit(featured)
    val assigned = model.transform(featured)
      .select(col("neighbor_id"), col("cv"), col("prediction").as("cell"),
        l2norm(col("cv")).as("cn"))

    // centroid table: nlist rows — trivially broadcast
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "centroid")

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2norm(col(vecCol)).as("qn"))
    // probe assignment: nprobe closest centroids per query (cosine)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(cosine(col("qv"), col("centroid")).desc, col("cell").asc)
    val probes = broadcast(q.crossJoin(broadcast(centroids))
      .withColumn("probe_rank", row_number().over(probeW))
      .where(col("probe_rank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell")))

    val scored = probes.join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** Exact all-pairs cosine above a threshold (near-dup audit). Quadratic:
    * bounded corpora only; the LSH variant is the scale path. */
  def cosinePairsExact(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      l2norm(col(vecCol)).as("na"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      l2norm(col(vecCol)).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
