package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  final case class CanonicalKey(user_id: Long, event_type: String, min_event_id: Long)

  /** Canonical-representative streaming dedup via `transformWithState`
    * (Spark 4's arbitrary-state API, the industrial successor of
    * `flatMapGroupsWithState`: typed per-key state variables, TTL
    * support, RocksDB-backed): per (user_id, event_type) key, track the
    * MINIMUM event_id ever seen and emit the current canonical id each
    * micro-batch. This is the streaming form of "keep the lowest doc_id
    * per duplicate group" that every LLM dedup pipeline uses — and unlike
    * first-seen-wins it is deterministic under any row order. */
  class CanonicalDedupProcessor
      extends StatefulProcessor[(Long, String), (Long, String, Long), CanonicalKey] {
    @transient private var minId: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      minId = getHandle.getValueState[Long]("minId", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        key: (Long, String),
        rows: Iterator[(Long, String, Long)],
        timerValues: TimerValues): Iterator[CanonicalKey] = {
      var mn = if (minId.exists()) minId.get() else Long.MaxValue
      rows.foreach(r => if (r._3 < mn) mn = r._3)
      minId.update(mn)
      Iterator.single(CanonicalKey(key._1, key._2, mn))
    }
  }

  /** Wire the processor: requires the RocksDB state store provider (set
    * `spark.sql.streaming.stateStore.providerClass` on the session). */
  def canonicalDedup(
      ds: Dataset[(Long, String, Long)]): Dataset[CanonicalKey] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(r => (r._1, r._2))
      .transformWithState(new CanonicalDedupProcessor,
        TimeMode.None(), OutputMode.Append())
  }

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
