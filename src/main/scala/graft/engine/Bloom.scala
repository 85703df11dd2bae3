package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types._

/** Bloom-filter runtime join pruning — the explicit form of the
  * "runtime filter" every warehouse engine applies to a selective join.
  *
  * At 100 TB the canonical pain is a fact⋈dim' join where the filtered
  * build side is too big to broadcast AS ROWS: a sort-merge join shuffles
  * the ENTIRE probe side, then the join discards 90+% of it. The fix is to
  * summarize the build side's join keys into a fixed-size bit array (here
  * 2²⁰ bits = 128 KiB — always broadcastable, regardless of build
  * cardinality), prune the probe side with a codegen'd membership test
  * BELOW its shuffle, and let the real join remove the false positives.
  * No false negatives (spec'd by ScalaCheck), so the composition is
  * EXACTLY the plain join — which is what the DuckDB oracle runs.
  *
  *  - build: `Aggregator[Long, Array[Long], Array[Long]]` — partials OR
  *    together map-side, the driver receives ONE 128 KiB row (precedent:
  *    the ncells-bounded centroid collect in IvfIndex).
  *  - probe: `BloomMightContain` — a codegen'd expression over the bit
  *    array (via `addReferenceObj`, no 16 k-element literal in the
  *    generated source), double-hashing k=5 probes off one XorShiftMix.
  *
  * Sizing: 2²⁰ bits / k=5 gives <0.1% false positives up to ~10⁵ build
  * keys and degrades GRACEFULLY above (pruning weakens, correctness never
  * does) — the deliberate fixed-budget trade for a deterministic plan.
  */
object Bloom {

  val NumLongs = 16384 // 2^20 bits = 128 KiB
  private val BitMask = (NumLongs.toLong * 64) - 1 // power of two
  val Probes = 5

  /** Double hashing (Kirsch & Mitzenmacher, ESA '06): probe i tests bit
    * (h1 + (i+1)·h2) mod 2²⁰, both halves from one 64-bit mix. Static
    * forwarder-friendly (called from generated code). */
  def add(bits: Array[Long], key: Long): Unit = {
    val h = XorShiftMix.compute(key)
    val h1 = h >>> 32
    val h2 = h & 0xffffffffL
    var i = 0
    while (i < Probes) {
      val pos = (h1 + (i + 1) * h2) & BitMask
      bits((pos >>> 6).toInt) |= (1L << (pos & 63))
      i += 1
    }
  }

  def contains(bits: Array[Long], key: Long): Boolean = {
    val h = XorShiftMix.compute(key)
    val h1 = h >>> 32
    val h2 = h & 0xffffffffL
    var i = 0
    while (i < Probes) {
      val pos = (h1 + (i + 1) * h2) & BitMask
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  final class BloomAggregator extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](NumLongs)
    override def reduce(b: Array[Long], key: Long): Array[Long] = { add(b, key); b }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < NumLongs) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  def mightContain(key: Column, bits: Array[Long]): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(key), bits))

  /** q_bloom_join: urgent finished orders ⋈ lineitem, revenue by order
    * month — with the probe side bloom-pruned below its exchange. The
    * oracle is the PLAIN join: the bloom must be semantically invisible.
    *
    * Deliberately NOT a broadcast join: the whole point is the plan that
    * survives when the build side outgrows the broadcast threshold — the
    * 128 KiB summary broadcasts forever, the rows never have to. */
  def qBloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
    val bits: Array[Long] = urgent.select(col("o_orderkey").as[Long])
      .select(new BloomAggregator().toColumn).head()
    val pruned = Tables.lineitem(spark, sfDir)
      .filter(mightContain(col("l_orderkey"), bits))
    pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(unix_micros(date_trunc("month", col("o_orderdate"))).as("month_us"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"),
        Exact.dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("month_us"))
  }

  val qBloomJoinSql: String =
    s"""SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
       |  COUNT(DISTINCT o_orderkey) AS n_orders,
       |  COUNT(*) AS n_lines,
       |  ${Exact.sqlSum6("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
       |GROUP BY 1 ORDER BY 1""".stripMargin
}

/** `bloom_might_contain(key)` over a plan-time bit array: nullSafeEval and
  * the generated code run the SAME double-hash probes (Bloom.contains via
  * its static forwarder), the array rides along as a referenced object. */
case class BloomMightContain(child: Expression, bits: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs a long child, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Bloom.contains(bits, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, k =>
      s"${ev.value} = graft.engine.Bloom.contains($ref, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
