package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators — the write-side levers that buy read-side
  * data skipping at scale (the bucketed-join and partition-pruning gates'
  * sibling, COVERAGE.md "Storage-layout levers").
  */
object Layout {

  /** Z-order (Morton) value of two non-negative ints: bit `i` of `a`
    * lands at position `2i`, bit `i` of `b` at `2i+1` — points close in
    * BOTH dimensions are close on the curve, so range-partitioning by
    * z-value clusters the file layout for predicates on EITHER column
    * (the Delta/Iceberg OPTIMIZE ZORDER semantics, from public Morton-
    * order literature). Pure integer bit expressions (shift/and/or),
    * codegen'd, map-only; exact in any engine with 64-bit integers.
    *
    * Callers pre-quantize to `bits` (e.g. `pmod(key, 1 << bits)`); values
    * outside [0, 2^bits) would interleave garbage, so they are rejected
    * loudly via a CASE that yields NULL (nulls also propagate NULL). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zValue: bits must be 1..31, got $bits")
    val bound = 1L << bits
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    val z = terms.reduce(_ bitwiseOR _)
    when(a.isNull || b.isNull ||
      a.cast("long") < 0 || a.cast("long") >= bound ||
      b.cast("long") < 0 || b.cast("long") >= bound, lit(null))
      .otherwise(z)
  }

  /** The DuckDB rendering of the SAME interleave, for oracle generation:
    * one expression string over column names `a` and `b`. */
  private[graft] def zValueSql(a: String, b: String, bits: Int = 16): String = {
    val bound = 1L << bits
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }
    s"CASE WHEN $a IS NULL OR $b IS NULL OR $a < 0 OR $a >= $bound " +
      s"OR $b < 0 OR $b >= $bound THEN NULL ELSE ${terms.mkString(" | ")} END"
  }

  /** Range-partition `df` by the z-value of two quantized key columns —
    * the write-side clustering pass: each output partition (= file at
    * write time) covers a compact curve segment, so per-file min/max on
    * BOTH underlying columns stay narrow and a reader's range predicate
    * on either column skips most files. One range exchange (sampled
    * boundaries), the same cost class as a global sort bucketing pass. */
  def zOrderBy(df: DataFrame, a: Column, b: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    val tmp = "_graft_zorder_tmp"
    require(!df.columns.contains(tmp),
      s"zOrderBy: input already has a '$tmp' column")
    df.withColumn(tmp, zValue(a, b, bits))
      .repartitionByRange(numPartitions, col(tmp))
      .sortWithinPartitions(col(tmp))
      .drop(tmp)
  }
}
