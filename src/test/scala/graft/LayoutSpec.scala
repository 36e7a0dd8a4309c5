package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.FileSourceScanExec

/** Storage-layout levers for the 100 TB posture: bucketing (co-located
  * joins — the shuffle happens ONCE at write time, then every join on the
  * bucket key is exchange-free) and partitioned layout (partition pruning
  * — a filtered read lists only matching directories). These are plan-level
  * guarantees, so the specs assert on the executed plan, not just results. */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession.{spark, table}

  test("bucketed tables join WITHOUT a shuffle exchange on either side") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val orders = table("orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = table("lineitem").select("l_orderkey", "l_quantity")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    try {
      // disable AQE for a deterministic plan shape; disable broadcast so
      // the join would OTHERWISE be a shuffle-requiring sort-merge
      val ss = spark.newSession()
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = ss.table("orders_b").join(ss.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be exchange-free, found ${shuffles.size} shuffles")
      // and it still computes the right thing
      val expected = table("orders").join(table("lineitem"),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = table("events").select("event_id", "user_id", "event_type", "value")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)
    val filtered = spark.read.parquet(out).where(col("event_type") === "click")
    val scans = filtered.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // the partition filter reached the scan, and the files actually read
    // all come from the matching partition directory
    assert(scans.head.partitionFilters.nonEmpty,
      "partition filter did not reach the scan")
    // the scan's own pruned listing reads exactly ONE of the five
    // event_type partitions, and every file it will open lives in the
    // matching directory
    val listing = scans.head.selectedPartitions
    assert(listing.partitionCount === 1,
      s"expected 1 pruned partition, scan lists ${listing.partitionCount}")
    val readDirs = listing.toPartitionArray
      .map(pf => new java.io.File(pf.filePath.toString).getParentFile.getName)
      .distinct.toSeq
    assert(readDirs === Seq("event_type=click"))
    assert(filtered.count() ===
      events.where(col("event_type") === "click").count())
  }

  test("zValue: hand bits, null/bound rejection; zOrderBy narrows BOTH key spans") {
    import SparkTestSession.{spark, table}
    import spark.implicits._
    import graft.functions.Layout
    // hand-interleave: a=0b101 (bits 0,2), b=0b011 (bits 0,1)
    // z bits: a0->0, b0->1, a1->2(0), b1->3, a2->4 => 1+2+8+16 = 27
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 3).as("z"))
      .head().getLong(0)
    assert(got === 27L)
    // out-of-range and null yield NULL, never garbage bits
    val bad = Seq((8L, 1L), (-1L, 1L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 3).as("z")).collect()
    assert(bad.forall(_.isNullAt(0)))
    // the LAYOUT claim, measured: range-partitioning by z keeps the
    // per-partition span of BOTH quantized keys narrow, while sorting by
    // one key leaves the other's span at full width in every partition
    // quantize to a curve the test-SF data actually occupies (partkey
    // has ~200 distinct values at sf0.001; a 1024-wide curve would be
    // 80% empty in that dimension and the 8 partitions too coarse)
    val li = table("lineitem").select(
      pmod(col("l_orderkey"), lit(256L)).as("ka"),
      pmod(col("l_partkey"), lit(256L)).as("kb"))
    def meanSpan(df: org.apache.spark.sql.DataFrame, c: String): Double =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg("span")).head().getDouble(0)
    val z = Layout.zOrderBy(li, col("ka"), col("kb"), bits = 8,
      numPartitions = 8).cache()
    val byA = li.repartitionByRange(8, col("ka")).cache()
    try {
      val zSpanB = meanSpan(z, "kb")
      val aSpanB = meanSpan(byA, "kb")
      assert(zSpanB < 0.7 * aSpanB,
        s"z-order kb span $zSpanB must beat single-key layout $aSpanB")
      // and the z layout still keeps ka spans FAR below full width
      assert(meanSpan(z, "ka") < 0.7 * 256.0)
    } finally { z.unpersist(); byA.unpersist(); () }
  }
}
