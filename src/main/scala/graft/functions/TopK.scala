package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k Aggregator — the §2.9 `Aggregator[IN, BUF, OUT]` extension
  * surface (the reference's only aggregation hook was an abandoned
  * Semigroup `conflate` sketch, join/package.scala:162-171).
  *
  * Buffer is bounded at k entries, so partial aggregation ships O(k) per
  * partition regardless of group size — the map-side-combine shape that
  * makes per-group top-k scale (vs. a window function, which shuffles every
  * row of the group). Ordering (score desc, id asc) is total, so results
  * are deterministic under any partitioning.
  */
object TopK {

  final case class Scored(score: Double, id: Long)

  /** Total order: score desc, id asc (NaN sorts last under the total
    * double ordering — callers filter non-finite scores; see
    * Similarity.rankTopK). */
  private val ord: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](e => (-e.score, e.id))

  def topK(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] = {
    // k <= 0 would make `b.size >= k` hold for an EMPTY buffer and the
    // bounded-insertion fast path dereference b.last — fail at
    // construction instead of with NoSuchElementException per input row.
    require(k > 0, s"topK: k must be positive, got $k")
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      // Buffer invariant: sorted by `ord`, at most k entries — maintained
      // by every transition, so the per-input-row path is a bounded
      // insertion (O(k) copy, O(1) reject when worse than the current
      // k-th), not the former sort-the-whole-buffer-per-row O(k log k)
      // allocation storm on large candidate streams.
      override def zero: Seq[Scored] = Vector.empty
      override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
        if (b.size >= k && ord.compare(b.last, a) <= 0) b
        else {
          val (better, worse) = b.span(e => ord.compare(e, a) <= 0)
          val ins = (better :+ a) ++ worse
          if (ins.size > k) ins.take(k) else ins
        }
      // linear merge of two sorted bounded buffers, stop at k
      override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = {
        val xs = x.toIndexedSeq; val ys = y.toIndexedSeq
        val out = Vector.newBuilder[Scored]
        var i = 0; var j = 0; var n = 0
        while (n < k && (i < xs.length || j < ys.length)) {
          if (j >= ys.length ||
            (i < xs.length && ord.compare(xs(i), ys(j)) <= 0)) {
            out += xs(i); i += 1
          } else { out += ys(j); j += 1 }
          n += 1
        }
        out.result()
      }
      override def finish(b: Seq[Scored]): Seq[Scored] = b
      override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    }
  }
}
