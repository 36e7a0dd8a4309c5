package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) — a
  * fixed-size frequency summary over an unbounded item stream, the §2.9
  * `Aggregator` extension surface like [[TopK]] and [[HeavyHitters]].
  *
  * Where [[HeavyHitters.misraGries]] answers "WHICH items are frequent"
  * (membership superset, lower-bound counts), Count-Min answers "ABOUT HOW
  * OFTEN is item x seen" for ANY x, with a one-sided guarantee:
  * `estimate(x) >= true(x)` always (counters only ever add arrivals), and
  * `estimate(x) <= true(x) + excess` where the excess is the colliding
  * mass in x's least-loaded row — expected `n / width` per hash row,
  * `P[> e*n/width] < (1/e)^depth` over the hash family.
  *
  * Why this exists at 100 TB: an exact per-term count is a full shuffle of
  * the Zipf tail; the sketch is `depth * width` longs per partition,
  * merged by element-wise ADDITION — the textbook mergeable summary, so
  * map-side combine ships a constant-size buffer no matter how many
  * billions of tokens a partition holds, and sketches built on disjoint
  * corpus shards (or different days of a crawl) combine losslessly.
  *
  * Determinism: row hashes are Murmur3 with fixed per-row seeds, and
  * counter cells are order-independent sums — the sketch, and every
  * estimate from it, is a pure function of the multiset of items.
  */
object CountMin {

  /** Fixed per-row hash seed. */
  private[functions] def rowSeed(row: Int): Int = 0x9747b28c + row

  /** Per-row item hash: Spark's Murmur3 (UTF-8 bytes) under a fixed
    * per-row seed, folded to [0, width). Deliberately the SAME family the
    * `hash()` expression computes, so [[estimateColumn]] can probe a
    * finished sketch with pure codegen'd built-ins — no UDF on the probe
    * path. */
  private[functions] def cell(item: String, row: Int, width: Int): Int = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(item)
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(u, org.apache.spark.sql.types.StringType, rowSeed(row).toLong).toInt
    ((h % width) + width) % width
  }

  /** Point estimate from a finished sketch (the min over x's cells). */
  def estimate(sketch: Seq[Long], item: String, depth: Int, width: Int): Long = {
    require(sketch.length == depth * width,
      s"sketch length ${sketch.length} != depth*width ${depth * width}")
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + cell(item, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** CMS over string items: the flattened `depth x width` counter matrix
    * (row-major). Probe it with [[estimate]]. */
  def countMin(depth: Int, width: Int): Aggregator[String, Array[Long], Seq[Long]] = {
    require(depth > 0 && width > 0,
      s"countMin: need positive depth/width, got depth=$depth width=$width")
    new Aggregator[String, Array[Long], Seq[Long]] {
      override def zero: Array[Long] = new Array[Long](depth * width)

      // one increment per hash row — O(depth) per input, no allocation
      override def reduce(b: Array[Long], a: String): Array[Long] = {
        var r = 0
        while (r < depth) {
          b(r * width + cell(a, r, width)) += 1L
          r += 1
        }
        b
      }

      // element-wise sum: the mergeable-summaries property that makes the
      // sketch shard-combinable (error bounds add with the counts)
      override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var i = 0
        while (i < x.length) { x(i) += y(i); i += 1 }
        x
      }

      override def finish(b: Array[Long]): Seq[Long] = b.toSeq
      override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    }
  }

  /** Column-level point estimate: `least` over the term's `depth` cells.
    * Pure built-ins (`hash(term, seed)` is the same Murmur3 the aggregator
    * uses via [[cell]]), so the probe stays inside whole-stage codegen —
    * this replaced the one remaining Scala UDF in the codebase. */
  def estimateColumn(sketch: org.apache.spark.sql.Column,
      term: org.apache.spark.sql.Column, depth: Int, width: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{element_at, least, lit, pmod}
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    require(depth > 0 && width > 0,
      s"estimateColumn: need positive depth/width, got depth=$depth width=$width")
    val cells: Seq[Column] = (0 until depth).map { r =>
      val h = column(org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
        Seq(expression(term)), rowSeed(r)))
      element_at(sketch, (pmod(h, lit(width)) + lit(r * width) + lit(1)).cast("int"))
    }
    val est = if (cells.lengthCompare(1) == 0) cells.head else least(cells: _*)
    // hash(NULL, seed) returns the seed unchanged, so a null term would probe
    // an arbitrary (valid) cell and yield a garbage count; the JVM-side
    // CountMin.estimate NPEs instead. Surface null-in -> null-out.
    org.apache.spark.sql.functions.when(term.isNull,
      lit(null).cast("long")).otherwise(est)
  }
}
