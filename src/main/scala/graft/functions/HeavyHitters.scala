package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch — frequent-item detection with a
  * HARD-BOUNDED buffer (k counters), the §2.9 `Aggregator` extension
  * surface like [[TopK]].
  *
  * Why this exists at 100 TB: the exact top terms of a corpus need a full
  * (term, count) groupBy — a shuffle carrying the whole Zipf tail (fine
  * for the vocabulary build, wasteful when only the head is wanted, e.g.
  * stopword discovery, boilerplate-token detection, per-crawl domain
  * dominance checks). Misra–Gries ships at most k counters per partition
  * (map-side combine), merges associatively (Agarwal et al., "Mergeable
  * Summaries", PODS'12: merged error stays ≤ n/(k+1)), and GUARANTEES
  * every item with true frequency > n/(k+1) is present in the final
  * sketch — no false negatives above threshold, ever.
  *
  * Counter VALUES are order-dependent (any MG run under-counts by up to
  * n/(k+1) depending on arrival interleaving) — callers must treat the
  * sketch as a guaranteed-superset membership list + lower-bound counts,
  * which is why the driver gate hashes only the membership booleans of
  * exactly-counted heavy hitters, never the sketch counts.
  */
object HeavyHitters {

  /** MG sketch over string items: returns the surviving items (the
    * guaranteed superset of every item with freq > n/(k+1)). */
  def misraGries(k: Int): Aggregator[String, Map[String, Long], Seq[String]] = {
    require(k > 0, s"misraGries: k must be positive, got $k")
    new Aggregator[String, Map[String, Long], Seq[String]] {
      override def zero: Map[String, Long] = Map.empty

      // classic MG step: hit → increment; room → insert; full → decrement
      // ALL counters by 1, dropping zeros (each decrement round "spends"
      // k+1 arrivals, which is where the n/(k+1) error bound comes from)
      override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
        b.get(a) match {
          case Some(c) => b.updated(a, c + 1)
          case None if b.size < k => b.updated(a, 1L)
          case None =>
            b.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
        }

      // mergeable-summaries merge: sum counters, then restore the k-bound
      // by subtracting the (k+1)-largest count from everything (the batch
      // form of the decrement step — error bounds add, staying ≤ n/(k+1))
      override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
        val sum = y.foldLeft(x) { case (acc, (i, c)) =>
          acc.updated(i, acc.getOrElse(i, 0L) + c)
        }
        if (sum.size <= k) sum
        else {
          val d = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
          sum.flatMap { case (i, c) => if (c > d) Some(i -> (c - d)) else None }
        }
      }

      // deterministic output order (the SET is what carries the guarantee)
      override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

      override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
    }
  }
}
