package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table catalog over one scale-factor directory
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * Plays the role of the reference's `Client`+`Session` connection plumbing
  * (reference: src/main/scala/join/package.scala:25-41 `StorageModule`;
  * src/main/scala/storage.scala:383-384 `connect`): in a Spark-first design a
  * table handle IS a lazily-planned `DataFrame`, and predicate/column pushdown
  * into the scan (the reference compiles filters into `find(query)`/CQL,
  * storage.scala:597,650) is supplied by Catalyst + the vectorized parquet
  * reader — `.explain` shows `PushedFilters`/`ReadSchema`.
  *
  * Scale posture: `spark.read.parquet` plans one task per ~maxPartitionBytes
  * split; nothing here materializes on the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables a planner should broadcast in joins. */
  val smallDims: Set[String] = Set("region", "nation", "supplier")

  /** Session settings every graft session needs. `events.parquet` carries
    * TIMESTAMP(NANOS) which Spark's vectorized reader rejects; reading nanos
    * as Long (converted explicitly via [[tsFromNanos]]) requires this conf.
    * It belongs at session construction — a loader mutating session conf is
    * a global side effect that surprises concurrent sessions — so every
    * entrypoint (Bench/Verify/RunOne/PlanAudit/tests) applies it at build
    * time via this map. */
  val sessionConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table '$name' (expected one of ${all.mkString(",")})")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events.ts (nanos-as-long) → TimestampType (microsecond precision).
    * Division goes through DECIMAL: `c / 1000L` on longs is DOUBLE division,
    * and epoch-nanos (~1.7e18) exceed double's 2^53 exact range — the
    * result was off by ±1µs on some rows. Decimal divide + truncating cast
    * is exact. */
  def tsFromNanos(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(
      (c.cast("decimal(38,0)") / 1000).cast("long"))
}
