package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native vector expressions for the similarity hot path.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) are evaluated
  * interpreted (CodegenFallback) — fine for a scalar here and there, but the
  * ANN queries evaluate a 64-element fold per candidate pair. This
  * `BinaryExpression` generates a tight primitive loop via `doGenCode`, the
  * "custom Catalyst Expression beats UDF beats interpreted" rung of the
  * extension ladder (SURVEY.md §2b UDF surface).
  *
  * Semantics: Σ a(i)·b(i) over the common prefix, accumulated in double.
  * Array elements are assumed non-null (embedding vectors; enforced by the
  * writer). Supports float and double element types on either side.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"dot product needs array children, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot product needs array<float|double> children, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = Math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double)$a.$lGet($i) * (double)$b.$rGet($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_dot_product"
}

object VectorExprs {
  /** Column-level dot product backed by the codegen'd expression. */
  def vdot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Cosine similarity from three codegen'd dots (norms are dot(x,x)). */
  def vcosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vdot(a, b) / (sqrt(vdot(a, a)) * sqrt(vdot(b, b)))
  }
}
