package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-key running aggregation over an unbounded
  * stream via `flatMapGroupsWithState`.
  *
  * The reference sketched (and abandoned) a Semigroup-based `conflate`
  * reduction on its parallel joiner (reference:
  * src/main/scala/join/package.scala:162-171, commented out) — evidence of
  * intended stateful aggregation that never shipped. Spark's
  * KeyValueGroupedDataset state API is the industrial form: checkpointed
  * state, timeout policies, exactly-once under retries.
  */
object Stateful {

  final case class KeyedCount(key: Long, events: Long, sum: Double)

  /** Running (count, sum) per key, emitted on every update — a conflate-style
    * accumulator. Works on batch Datasets too (state spans the whole input).
    */
  def runningTotals[T](
      ds: Dataset[T],
      key: T => Long,
      value: T => Double)(implicit e: Encoder[T]): Dataset[KeyedCount] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)
      .flatMapGroupsWithState[KeyedCount, KeyedCount](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: Long, rows: Iterator[T], state: GroupState[KeyedCount]) =>
          val prev = state.getOption.getOrElse(KeyedCount(k, 0L, 0.0))
          var n = prev.events
          var s = prev.sum
          rows.foreach { r => n += 1; s += value(r) }
          val next = KeyedCount(k, n, s)
          state.update(next)
          Iterator(next)
      }
  }
}
