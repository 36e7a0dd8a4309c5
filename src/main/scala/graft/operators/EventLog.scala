package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Partitioned event-log scan with offset resume.
  *
  * Reference semantics (src/main/scala/log/package.scala:56-62 `Log[M].from`;
  * storage.scala:329-349,660-681 iterators; CassandraAsyncStage.scala:29-100):
  * an unbounded ordered scan over rows keyed `(persistence_id, partition_nr,
  * sequence_nr)` where `partition_nr = sequence_nr / maxPartitionSize` is an
  * artificial sharding the reader must hop across, resuming from
  * `sequence_nr >= offset`.
  *
  * Spark-first translation: the partition arithmetic is *derived data*, not a
  * scan loop — a filter + computed column; Catalyst turns the key/offset
  * filters into parquet pushdown + partition pruning (on data partitioned by
  * key). Ordering is declared, not assumed from storage layout.
  *
  * Scale posture: a single key's log is one partition-pruned slice; for
  * all-keys processing keep `orderBy` off and use window-per-key
  * (`Window.partitionBy(key).orderBy(seq)`) so no global sort happens.
  */
object EventLog {

  /** S3/O6 — batch log read for one key from an offset, ordered by sequence.
    * `partition_nr` is exposed to match the reference's observable layout. */
  def from(
      log: DataFrame,
      keyCol: String,
      key: Column,
      seqCol: String,
      offset: Long,
      maxPartitionSize: Long = 5000000L): DataFrame =
    log
      .where(col(keyCol) === key && col(seqCol) >= offset)
      .withColumn("partition_nr", floor(col(seqCol) / lit(maxPartitionSize)))
      .orderBy(col(seqCol))

  /** S4/T1-T3 — unbounded variant: Structured Streaming file source over the
    * same layout; `offset` maps to the reference's resume point, micro-batch
    * demand replaces its demand-driven paging (storage.scala:149,172-180).
    * Run with `Trigger.AvailableNow` for bounded tests. */
  def stream(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      keyCol: String,
      key: Column,
      seqCol: String,
      offset: Long,
      maxPartitionSize: Long = 5000000L,
      fileGlob: String = "*.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // maxFilesPerTrigger is the micro-batch demand bound — the analogue of
    // the reference's demand-driven paging (T2: request(n) cadence,
    // storage.scala:149,172-180; async prefetch CassandraAsyncStage.scala:29).
    val reader = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", fileGlob)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toLong))
    reader.parquet(dir)
      .where(col(keyCol) === key && col(seqCol) >= offset)
      .withColumn("partition_nr", floor(col(seqCol) / lit(maxPartitionSize)))
  }

  /** Changelog materialization (CDC apply): fold an upsert/delete log
    * into LATEST-STATE per key — the lakehouse MERGE/compaction semantics
    * over exactly the partitioned event logs this module scans (the
    * reference's domain is the log; the natural query over a log is its
    * current state). Latest = max (tsCol, tieCol) per key, struct-ordered;
    * a key whose latest op equals `deleteOp` is absent from the result.
    *
    * Scale shape: ONE partial-aggregated max(struct) per key — map-side
    * combine reduces each partition to one candidate row per key before
    * the shuffle (the pipe_rag_index min(struct) discipline), never a
    * per-key window sort over the full log. Determinism requires
    * (tsCol, tieCol) unique per key — a unique event/sequence id as the
    * tie satisfies it. */
  def applyChangelog(
      log: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      opCol: String,
      deleteOp: String,
      payload: Seq[String]): DataFrame = {
    val ordered = Seq(tsCol, tieCol, opCol) ++ payload
    log.groupBy(col(keyCol))
      .agg(max(struct(ordered.map(col): _*)).as("last"))
      .where(col(s"last.$opCol") =!= deleteOp)
      .select(col(keyCol) +: ordered.map(c => col(s"last.$c").as(c)): _*)
  }

  /** Snapshot AS OF — time travel over the changelog: the table state the
    * log described at time `asOf` (Delta/Iceberg `VERSION AS OF` semantics
    * expressed against the raw log instead of committed snapshots). It is
    * [[applyChangelog]] over the log restricted to `tsCol <= asOf`: events
    * after the bound — including deletes — have not happened yet, so a key
    * deleted later is PRESENT in the snapshot and a key inserted later is
    * absent.
    *
    * Scale shape: the time bound is an ordinary pushable predicate — on a
    * log laid out by time (partitioned or z-ordered on `tsCol`) the scan
    * prunes to the prefix ≤ asOf before the same one-shuffle max(struct)
    * fold as [[applyChangelog]]. No snapshot index is required. */
  def snapshotAsOf(
      log: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      opCol: String,
      deleteOp: String,
      payload: Seq[String],
      asOf: Column): DataFrame =
    applyChangelog(log.where(col(tsCol) <= asOf), keyCol, tsCol, tieCol,
      opCol, deleteOp, payload)

  /** Resample + gap-fill — the `time_bucket` + `locf` primitive of
    * time-series stores (TimescaleDB/InfluxDB semantics) over the same
    * event logs this module scans: bucket each key's events into
    * fixed-width intervals, emit EVERY bucket in the key's [first, last]
    * span (gaps included), carrying the last observed value forward
    * (LOCF) into empty buckets. Latest-in-bucket is decided by the
    * (tsUsCol, tieCol) pair, so results are deterministic under ties.
    *
    * Scale shape: bucketing is exact integer FLOOR division (`pmod`-
    * adjusted `div`, never a double-rounded quotient at bucket edges —
    * and never truncate-toward-zero, which would give pre-1970
    * timestamps a double-width bucket 0 with shifted boundaries)
    * feeding ONE partial-aggregated groupBy; the grid explode and the LOCF window are both
    * per-key and span-bounded (a key's buckets, not the corpus), so no
    * global sort or corpus-sized window exists at any scale.
    *
    * Output: (keyCol, bucket, n_events, value_locf) — one row per key per
    * bucket in the key's span; `value_locf` is NULL only before the key's
    * first observation. */
  def resampleLocf(
      log: DataFrame,
      keyCol: String,
      tsUsCol: String,
      tieCol: String,
      valueCol: String,
      bucketUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // floor division: subtract the always-non-negative pmod remainder
    // first, so `div` (truncating) lands on the floor for negative ts too
    val buckets = log
      .withColumn("bucket",
        expr(s"($tsUsCol - pmod($tsUsCol, ${bucketUs}L)) div ${bucketUs}L"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col(tsUsCol), col(tieCol), col(valueCol)))
          .getField(valueCol).as("_v_last"))
    val grid = buckets.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("_b0"), max(col("bucket")).as("_b1"))
      .select(col(keyCol),
        explode(sequence(col("_b0"), col("_b1"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(buckets, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("_v_last"), ignoreNulls = true).over(w).as("value_locf"))
  }
}
