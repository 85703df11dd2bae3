package graft.engine

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed custom aggregation (SURVEY.md §2b UDAF surface): an exact top-k
  * as an `Aggregator[IN, BUF, OUT]` registered via `udaf(...)`.
  *
  * Why this shape at 100 TB: a global `ORDER BY x LIMIT k` is already
  * optimal in Spark (TakeOrderedAndProject), but top-k PER GROUP as a
  * window (`row_number() <= k`) must sort every group's full data. This
  * aggregator keeps a k-bounded buffer per group, combines map-side, and
  * ships only O(k) per group across the shuffle.
  */
object Aggregators {

  /** Bounded top-k buffer: parallel arrays, descending by score with id as
    * deterministic tiebreak. Product-encodable. */
  final case class TopKBuf(scores: Array[Double], ids: Array[Long])

  final class TopKAggregator(k: Int)
      extends Aggregator[(Double, Long), TopKBuf, Array[Long]] {

    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

    override def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf =
      merge(b, TopKBuf(Array(in._1), Array(in._2)))

    /** Merge two sorted bounded buffers (classic k-way front merge). */
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      val n = Math.min(k, a.ids.length + b.ids.length)
      val scores = new Array[Double](n)
      val ids = new Array[Long](n)
      var i = 0; var j = 0; var o = 0
      while (o < n) {
        val takeA = j >= b.ids.length ||
          (i < a.ids.length && better(a.scores(i), a.ids(i), b.scores(j), b.ids(j)))
        if (takeA) { scores(o) = a.scores(i); ids(o) = a.ids(i); i += 1 }
        else { scores(o) = b.scores(j); ids(o) = b.ids(j); j += 1 }
        o += 1
      }
      TopKBuf(scores, ids)
    }

    override def finish(b: TopKBuf): Array[Long] = b.ids

    override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** q_topk_group: top-3 orders per order-priority via the typed
    * aggregator — one shuffle carrying O(k) per group instead of a
    * per-group full sort. Engine-only (the aggregator is ours); the spec
    * cross-checks it against the window formulation. */
  def qTopkGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val topk = udaf(new TopKAggregator(3))
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top_ids"))
      .select(col("o_orderpriority"), posexplode(col("top_ids")).as(Seq("rank0", "o_orderkey")))
      .select(col("o_orderpriority"), (col("rank0") + 1).cast("long").as("rank"), col("o_orderkey"))
      .orderBy(col("o_orderpriority"), col("rank"))
  }

  /** The aggregator's contract in SQL: descending score, ascending id
    * tiebreak — the window formulation it outperforms at scale is its
    * exact oracle. */
  val qTopkGroupSql: String =
    """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank, o_orderkey
      |FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_orderpriority, rank""".stripMargin
}
