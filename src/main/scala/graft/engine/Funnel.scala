package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over the event stream: how many users
  * progressed view → click → purchase IN THAT ORDER within bounded
  * conversion windows — the standard product-analytics query every event
  * warehouse runs, and a sequential-pattern shape the plain relational
  * surface doesn't cover.
  *
  * Semantics (the greedy/earliest matching the oracle replays as nested
  * min-CTEs): t1 = first 'view'; t2 = first 'click' in (t1, t1+8h];
  * t3 = first 'purchase' in (t2, t2+24h]. Strict lower bounds make ties
  * deterministic without a tiebreak column.
  *
  * Plan shape: THREE chained conditional-min windows over the SAME
  * (user_id) partitioning — one exchange, one sort, three Window nodes
  * back to back, each carrying O(1) running state per user (no
  * collect_list materialization of a user's history). The final stage
  * count is a 3-row global aggregate. At 100 TB the funnel costs exactly
  * one shuffle of the filtered event types. */
object Funnel {

  private val ClickWinUs = 8L * 3600 * 1000000    // view → click within 8 h
  private val BuyWinUs = 24L * 3600 * 1000000     // click → purchase within 24 h

  /** Per-user stage times (t1, t2, t3) — factored out so the streaming
    * twin's spec can compare its carried state against the batch windows
    * directly (FunnelStreamSpec). */
  private[graft] def userStages(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts_us") > col("t1") &&
        col("ts_us") <= col("t1") + lit(ClickWinUs), col("ts_us"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts_us") > col("t2") &&
        col("ts_us") <= col("t2") + lit(BuyWinUs), col("ts_us"))).over(w))
      .select(col("user_id"), col("t1"), col("t2"), col("t3"))
      .distinct() // one row per user: the window columns are constant per key
  }

  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val staged = userStages(spark, sfDir)
    staged.agg(
        count(col("t1")).as("u1"),
        count(col("t2")).as("u2"),
        count(col("t3")).as("u3"))
      .select(expr(
        "stack(3, '1_view', u1, '2_click', u2, '3_purchase', u3) AS (stage, users)"))
      .orderBy(col("stage"))
  }

  /** The same greedy-earliest semantics as nested min-CTEs. */
  val qFunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
      |    AND epoch_us(e.ts) <= s1.t1 + 28800000000
      |  GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
      |  JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
      |    AND epoch_us(e.ts) <= s2.t2 + 86400000000
      |  GROUP BY e.user_id
      |)
      |SELECT stage, users FROM (
      |  SELECT '1_view' AS stage, count(*) AS users FROM s1
      |  UNION ALL
      |  SELECT '2_click', count(*) FROM s2
      |  UNION ALL
      |  SELECT '3_purchase', count(*) FROM s3
      |) ORDER BY stage""".stripMargin
}
