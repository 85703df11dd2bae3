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

/** Int8 scalar quantization of an embedding vector, one pass.
  *
  * Returns struct(lo, hi, q) where lo/hi are the vector's min/max (as
  * double) and q(i) = floor((v(i) − lo)·255 / (hi − lo) + 0.5) ∈ [0, 255]
  * (all-zero when hi == lo). Every arithmetic step is an IEEE-754
  * correctly-rounded double op with a fixed parenthesization, so the
  * quantized codes are bit-identical cross-engine and DuckDB-replayable
  * (Quantize.qQuantizeEmbedSql mirrors the expression token-for-token).
  *
  * WHY an expression and not `transform(v, x -> ...(array_min(v))...)`:
  * a column subtree referenced inside a higher-order-function lambda is
  * re-evaluated PER ELEMENT once CollapseProject inlines it (ROADMAP
  * "perf learnings"), so the min/max folds would run d times each —
  * O(d²) per vector. Here min/max and the quantize loop run once, and
  * codegen stays whole-stage (same static-helper pattern as XorShiftMix).
  */
case class QuantizeU8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = QuantizeU8.OutType

  /** Degenerate vectors (empty, or containing null/NaN elements) return
    * NULL rather than garbage codes — parquet array schemas default to
    * containsNull=true even when the writer never emits one, so the type
    * check can't reject them statically. */
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quantize_u8 needs an array<float|double> child, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    QuantizeU8.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.engine.QuantizeU8.compute($v, $isFloat);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): QuantizeU8 =
    copy(child = newChild)

  override def prettyName: String = "quantize_u8"
}

object QuantizeU8 {
  val OutType: StructType = StructType(Seq(
    StructField("lo", DoubleType, nullable = false),
    StructField("hi", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** Static entry shared by interpreted eval and generated code. Returns
    * null for degenerate input (empty array, null or NaN element) —
    * deterministic and visible, instead of codes computed from phantom
    * values. */
  def compute(arr: ArrayData, isFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (v.isNaN) return null
      if (v < lo) lo = v
      if (v > hi) hi = v
      i += 1
    }
    val q = new Array[Int](n)
    if (hi != lo) {
      val range = hi - lo
      i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        // fixed parenthesization, mirrored by the DuckDB oracle:
        // floor(((v - lo) * 255.0) / (hi - lo) + 0.5)
        q(i) = math.floor(((v - lo) * 255.0) / range + 0.5).toInt
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(lo, hi,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(q))
  }
}

/** Squared L2 distance between two int-code vectors (quantized
  * embeddings), accumulated in long — exact integer arithmetic, the
  * distance kernel of the quantized IVF path (Quantize.qSimIvfQuant).
  * Same codegen rationale as FloatDotProduct: this runs per candidate
  * pair on the ANN hot path, where an interpreted zip_with/aggregate
  * fold would dominate. */
case class IntSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_sq_dist needs array<int> children, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = Math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = (x.getInt(i) - y.getInt(i)).toLong
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = (long)($a.getInt($i) - $b.getInt($i));
         |  $sum += $d * $d;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntSqDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "int_sq_dist"
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

  /** struct(lo, hi, q): int8 scalar quantization, one codegen'd pass. */
  def quantizeU8(v: Column): Column =
    GraftColumnBridge.column(QuantizeU8(GraftColumnBridge.expression(v)))

  /** Exact squared L2 over int-code vectors, as long. */
  def intSqDist(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntSqDist(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
