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
  * predicate is exactly equivalent to a raw-long range (bounds adjusted
  * for IntegralDivide's truncate-toward-zero semantics, see nsLowerBound —
  * plain a·1000 would mis-filter pre-1970 negative nanos):
  *
  *   trunc(x/1000) >= a_us  ⇔  x >= L(a_us)
  *   trunc(x/1000) <  b_us  ⇔  x <  L(b_us)
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

  /** With t = trunc(x/1000) (IntegralDivide truncates toward ZERO, not
    * floor — they differ for negative pre-1970 nanos):
    *   t >= a ⇔ x >= L(a)  and  t < b ⇔ x < L(b), where
    *   L(a) = a·1000        for a > 0   (x < 0 ⇒ t <= 0 < a, both false)
    *   L(a) = a·1000 − 999  for a <= 0  (e.g. t >= 0 ⇔ x >= −999).
    * None when the ns bound would overflow a long (rewrite skipped). */
  private def nsLowerBound(us: Long): Option[Literal] =
    if (us > Long.MaxValue / 1000 || us < Long.MinValue / 1000 + 1) None
    else Some(Literal(if (us > 0) us * 1000L else us * 1000L - 999L, LongType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = cond.transform {
        case e @ GreaterThanOrEqual(NanosToMicros(x), Literal(us: Long, TimestampType)) =>
          nsLowerBound(us).map(GreaterThanOrEqual(x, _)).getOrElse(e)
        case e @ LessThan(NanosToMicros(x), Literal(us: Long, TimestampType)) =>
          nsLowerBound(us).map(LessThan(x, _)).getOrElse(e)
        case e @ GreaterThan(NanosToMicros(x), Literal(us: Long, TimestampType)) =>
          // t > a ⇔ t >= a+1 ⇔ x >= L(a+1); a = MaxValue is unsatisfiable, skip
          if (us == Long.MaxValue) e
          else nsLowerBound(us + 1).map(GreaterThanOrEqual(x, _)).getOrElse(e)
        case e @ LessThanOrEqual(NanosToMicros(x), Literal(us: Long, TimestampType)) =>
          // t <= a ⇔ t < a+1 ⇔ x < L(a+1); a = MaxValue is trivially true, skip
          if (us == Long.MaxValue) e
          else nsLowerBound(us + 1).map(LessThan(x, _)).getOrElse(e)
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
