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

  def topK(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] =
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      private def trim(s: Seq[Scored]): Seq[Scored] =
        s.sortBy(e => (-e.score, e.id)).take(k)
      override def zero: Seq[Scored] = Nil
      override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = trim(a +: b)
      override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
      override def finish(b: Seq[Scored]): Seq[Scored] = trim(b)
      override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    }
}
