package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{
  Cast, Expression, IntegralDivide, Literal, MicrosToTimestamp, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Schema-adaptive event-time normalization: `ts` → `TimestampType`
  * (microsecond precision, session time zone — graft sessions pin UTC via
  * `Tables.sessionConf`).
  *
  * The testdata generator has shipped `events.ts` under two encodings so
  * far: TIMESTAMP(NANOS) read as `Long` (via
  * `spark.sql.legacy.parquet.nanosAsLong`) and native `timestamp[us]`
  * (Spark `TIMESTAMP_NTZ`). This expression dispatches on the CHILD'S
  * RESOLVED TYPE at analysis time, so every call site — batch and
  * `readStream` alike — keeps working across the drift instead of failing
  * with a cast error 19 gates deep (the round-9 breakage).
  *
  * Long path: exact integral nanos→micros division. `c / 1000` at the
  * Column level is DOUBLE division and epoch-nanos (~1.7e18) exceed
  * double's 2^53 exact range — `IntegralDivide` on longs is exact, and
  * epoch values are positive so floor == truncate.
  *
  * Timestamp paths delegate to `Cast`, which handles NTZ→LTZ under the
  * session time zone (UTC ⇒ value-identical).
  */
case class NormalizeEventTs(child: Expression)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case LongType          => MicrosToTimestamp(IntegralDivide(child, Literal(1000L)))
    case TimestampType     => child
    case TimestampNTZType  =>
      // ResolveTimeZone never descends into `replacement`, so the cast's
      // zone must be supplied here; graft sessions pin it to UTC.
      Cast(child, TimestampType,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other — expected BIGINT (nanos) or a timestamp type; " +
        "the testdata encoding drifted again: extend graft.expressions.NormalizeEventTs")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeEventTs =
    copy(child = newChild)
}
