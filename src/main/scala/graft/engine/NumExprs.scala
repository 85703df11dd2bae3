package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types._

/** Order-preserving IEEE-754 bit key for doubles.
  *
  * `sortableBits(a) <= sortableBits(b)  ⇔  a <= b` under the floating
  * total order (-0.0 just below 0.0, NaN above +Inf — the same total order
  * Spark's sort uses), so any right-shift of the key is a monotone,
  * scale-invariant bucketing of the double line: equal-width buckets in
  * bit space ≈ exponentially sized buckets in value space, which is
  * exactly what a value-distribution-agnostic histogram wants. Used by the
  * exact distributed percentile in Relational.qPercentileDisc: a
  * histogram on `sortableBits >> k` bounds every refinement bucket to a
  * 2^k-wide slice of bit space regardless of the column's range or unit.
  *
  * The mapping is the classic sortable-bits trick, branch-free:
  * `b ^ ((b >> 63) & Long.MaxValue)` over the raw `doubleToLongBits`
  * flips the 63 magnitude bits of negatives (their bit patterns order
  * backwards) and leaves positives untouched; the IEEE sign bit then
  * doubles as the long's sign bit, so the result compares correctly as a
  * SIGNED long with no further correction (negatives stay negative longs,
  * positives stay positive).
  */
case class SortableDoubleBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sortable_double_bits needs a double child, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    b ^ ((b >> 63) & Long.MaxValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = Double.doubleToLongBits($d);
         |${ev.value} = ($b ^ (($b >> 63) & Long.MAX_VALUE));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SortableDoubleBits =
    copy(child = newChild)

  override def prettyName: String = "sortable_double_bits"
}

object NumExprs {
  /** Signed-long key preserving the double total order. */
  def sortableBits(c: Column): Column =
    GraftColumnBridge.column(SortableDoubleBits(GraftColumnBridge.expression(c)))
}
