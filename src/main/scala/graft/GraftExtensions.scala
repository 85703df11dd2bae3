package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.engine.{JsonStringCast, MinHashBands, PiiScrub, RepetitionStats, RollingFingerprint, ShingleHashes, SimHash64, SortableDoubleBits, TokenCounts, XorShiftMix}
import graft.engine.{FloatDotProduct, IntSqDist, QuantizeU8}
import graft.plans.NanosRangePushdown

/** Session-extension entry point for cluster deployments:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the engine's Catalyst additions into every session built on
  * the cluster without any imperative setup call:
  *
  *  - `NanosRangePushdown` optimizer rule (restores parquet row-group
  *    pruning for range predicates written against converted
  *    TIMESTAMP(NANOS) columns — plans/NanosRangePushdown.scala);
  *  - `json_string_cast` SQL function (the StringCast SMT's scalar,
  *    engine/Cast.scala).
  *
  * Local/programmatic sessions get the same behavior lazily —
  * `Tables.load` installs the rule idempotently and `qStringCast`
  * registers the function — so the extension is additive, not required.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NanosRangePushdown)
    ext.injectFunction((
      new FunctionIdentifier("json_string_cast"),
      new ExpressionInfo(classOf[JsonStringCast].getName, "json_string_cast"),
      (exprs: Seq[Expression]) => JsonStringCast(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("float_dot_product"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot_product"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "token_counts"),
      (exprs: Seq[Expression]) => TokenCounts(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (exprs: Seq[Expression]) => MinHashBands(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (exprs: Seq[Expression]) => RollingFingerprint(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (exprs: Seq[Expression]) => RepetitionStats(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("pii_scrub"),
      new ExpressionInfo(classOf[PiiScrub].getName, "pii_scrub"),
      (exprs: Seq[Expression]) => PiiScrub(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("xorshift_mix"),
      new ExpressionInfo(classOf[XorShiftMix].getName, "xorshift_mix"),
      (exprs: Seq[Expression]) => XorShiftMix(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("sortable_double_bits"),
      new ExpressionInfo(classOf[SortableDoubleBits].getName, "sortable_double_bits"),
      (exprs: Seq[Expression]) => SortableDoubleBits(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("quantize_u8"),
      new ExpressionInfo(classOf[QuantizeU8].getName, "quantize_u8"),
      (exprs: Seq[Expression]) => QuantizeU8(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("int_sq_dist"),
      new ExpressionInfo(classOf[IntSqDist].getName, "int_sq_dist"),
      (exprs: Seq[Expression]) => IntSqDist(exprs.head, exprs(1))))
  }
}
