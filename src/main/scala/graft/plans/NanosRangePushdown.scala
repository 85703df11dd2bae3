package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Custom optimizer rule (SURVEY.md §4 "illustrative Rule" slot, here with a
  * real job): parquet TIMESTAMP(NANOS) columns are read as raw nanosecond
  * longs and converted with `timestamp_micros(ts div 1000)` (Tables.events).
  * A range predicate written against the CONVERTED column —
  *
  *   Filter(timestamp_micros(ts_ns div 1000) >= TIMESTAMP 'a', Scan)
  *
  * — is an expression over the column, so the parquet reader can't push it
  * down and every row group gets read. The conversion is monotonic, so the
  * predicate is exactly equivalent to a raw-long range:
  *
  *   floor(x/1000) >= a_us  ⇔  x >= a_us*1000
  *   floor(x/1000) <  b_us  ⇔  x <  b_us*1000      (floor div, 1000 > 0)
  *
  * After this rewrite the comparison is on the bare column and lands in the
  * scan's PushedFilters — at 100 TB that's row-group/partition pruning for
  * every incremental window query instead of a full scan.
  *
  * Installed via `spark.experimental.extraOptimizations` (runs after the
  * main optimizer batches, i.e. after PushDownPredicates has substituted
  * the conversion expression into the filter) — no session-construction
  * hook needed, so it works under any caller's session.
  */
object NanosRangePushdown extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(x div 1000) over a long child. */
  private object NanosToMicros {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(x, Literal(1000L, LongType), _))
          if x.dataType == LongType => Some(x)
      case _ => None
    }
  }

  private def us2ns(us: Long): Option[Literal] =
    if (us > Long.MaxValue / 1000 || us < Long.MinValue / 1000) None
    else Some(Literal(us * 1000L, LongType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = cond.transform {
        case GreaterThanOrEqual(NanosToMicros(x), Literal(us: Long, TimestampType)) =>
          us2ns(us).map(GreaterThanOrEqual(x, _)).getOrElse(
            GreaterThanOrEqual(MicrosToTimestamp(IntegralDivide(x, Literal(1000L))), Literal(us, TimestampType)))
        case LessThan(NanosToMicros(x), Literal(us: Long, TimestampType)) =>
          us2ns(us).map(LessThan(x, _)).getOrElse(
            LessThan(MicrosToTimestamp(IntegralDivide(x, Literal(1000L))), Literal(us, TimestampType)))
        case GreaterThan(NanosToMicros(x), Literal(us: Long, TimestampType)) =>
          // floor(x/1000) > a ⇔ x >= (a+1)*1000
          us2ns(us + 1).map(GreaterThanOrEqual(x, _)).getOrElse(
            GreaterThan(MicrosToTimestamp(IntegralDivide(x, Literal(1000L))), Literal(us, TimestampType)))
        case LessThanOrEqual(NanosToMicros(x), Literal(us: Long, TimestampType)) =>
          // floor(x/1000) <= a ⇔ x < (a+1)*1000
          us2ns(us + 1).map(LessThan(x, _)).getOrElse(
            LessThanOrEqual(MicrosToTimestamp(IntegralDivide(x, Literal(1000L))), Literal(us, TimestampType)))
      }
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
  }

  /** Idempotent installation into a session's experimental optimizations. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq NanosRangePushdown))
      spark.experimental.extraOptimizations = cur :+ NanosRangePushdown
  }
}
