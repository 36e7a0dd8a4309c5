package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

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

  /** Per-row item hash: Murmur3 of the item under a fixed per-row seed,
    * folded to [0, width). */
  private[functions] def cell(item: String, row: Int, width: Int): Int = {
    val h = MurmurHash3.stringHash(item, 0x9747b28c + row)
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
}
