package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit — the validation gate a training-data pipeline runs
  * before a corpus snapshot is allowed downstream: row counts, null
  * counts, key uniqueness, referential integrity and domain checks,
  * emitted as one narrow (table, metric, value) frame a scheduler can
  * diff against thresholds.
  *
  * Reference anchor: the reference's only data validation is the null-key
  * drop (SURVEY §2a R7, ChargeOverSourceTask.java:418-424) — this is that
  * idea promoted to a first-class audit over every table.
  *
  * Scale posture: every metric is an aggregate — one pass per table with
  * map-side partials (count/sum fuse into a single HashAggregate), and
  * the integrity checks are anti-join counts whose build sides are the
  * key columns only. All metrics are exact integers, so the audit is
  * hash-deterministic across engines — no sampling, no sketches, nothing
  * that can flap between runs.
  */
object Quality {

  /** q_dq_audit: the audit over orders/lineitem/events/documents.
    *
    * Metric families:
    *  - `rows`               table cardinality
    *  - `nulls:<col>`        null count of a load-bearing column
    *  - `dup_pk`             rows beyond the first per declared unique key
    *  - `orphans:<fk>`       child rows whose FK misses the parent PK
    *  - `domain:<rule>`      rows violating a value-domain rule
    *
    * Each check is independent, so they compose as a union of small
    * aggregates; Spark runs the per-table scans in one job and AQE picks
    * broadcast for the key-only anti-join builds. */
  def qDqAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val events = Tables.events(spark, sfDir)
    val documents = Tables.documents(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)

    // one scan per table: all counting metrics fuse into one aggregate row
    val ordersAgg = orders.agg(
      count(lit(1)).as("rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nulls_custkey"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("neg_price"),
      (count(lit(1)) - count_distinct(col("o_orderkey"))).as("dup_pk"))
    val lineitemAgg = lineitem.agg(
      count(lit(1)).as("rows"),
      sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)).as("neg_qty"),
      (count(lit(1)) - count_distinct(
        col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_partkey"))).as("dup_pk"))
    val eventsAgg = events.agg(
      count(lit(1)).as("rows"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("nulls_user"),
      sum(when(col("ts").isNull, 1L).otherwise(0L)).as("nulls_ts"),
      (count(lit(1)) - count_distinct(col("event_id"))).as("dup_pk"))
    val documentsAgg = documents.agg(
      count(lit(1)).as("rows"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("empty_text"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("n_chars_drift"),
      (count(lit(1)) - count_distinct(col("doc_id"))).as("dup_pk"))
    // referential integrity: key-only anti-join, build side = parent PKs
    val orphanOrders = orders.select(col("o_custkey"))
      .join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val orphanLineitem = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))

    // stack() unpivots the 1-row aggregate IN PLACE — one scan per table
    // feeds all of its metrics (a union of per-metric selects would
    // re-run the whole table aggregate once per metric row)
    def unpack(agg: DataFrame, table: String, cols: (String, String)*): DataFrame = {
      val stackArgs = cols.map { case (c, metric) =>
        s"'${metric.replace("'", "''")}', CAST($c AS BIGINT)"
      }.mkString(", ")
      agg.select(lit(table).as("table_name"),
        expr(s"stack(${cols.size}, $stackArgs)").as(Seq("metric", "value")))
    }

    unpack(ordersAgg, "orders",
        "rows" -> "rows", "nulls_custkey" -> "nulls:o_custkey",
        "neg_price" -> "domain:o_totalprice>0", "dup_pk" -> "dup_pk")
      .unionAll(unpack(lineitemAgg, "lineitem",
        "rows" -> "rows", "neg_qty" -> "domain:l_quantity>0",
        "dup_pk" -> "dup_pk"))
      .unionAll(unpack(eventsAgg, "events",
        "rows" -> "rows", "nulls_user" -> "nulls:user_id",
        "nulls_ts" -> "nulls:ts", "dup_pk" -> "dup_pk"))
      .unionAll(unpack(documentsAgg, "documents",
        "rows" -> "rows", "empty_text" -> "domain:text_nonempty",
        "n_chars_drift" -> "domain:n_chars=len", "dup_pk" -> "dup_pk"))
      .unionAll(orphanOrders.select(lit("orders").as("table_name"),
        lit("orphans:o_custkey").as("metric"), col("v").cast("long").as("value")))
      .unionAll(orphanLineitem.select(lit("lineitem").as("table_name"),
        lit("orphans:l_orderkey").as("metric"), col("v").cast("long").as("value")))
      .orderBy(col("table_name"), col("metric"))
  }

  val qDqAuditSql: String =
    """WITH o AS (SELECT COUNT(*) AS rows,
      |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nulls_custkey,
      |    SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS neg_price,
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_pk FROM orders),
      |l AS (SELECT COUNT(*) AS rows,
      |    SUM(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END) AS neg_qty,
      |    COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber, l_suppkey, l_partkey)) AS dup_pk
      |  FROM lineitem),
      |e AS (SELECT COUNT(*) AS rows,
      |    SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nulls_user,
      |    SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS nulls_ts,
      |    COUNT(*) - COUNT(DISTINCT event_id) AS dup_pk FROM events),
      |d AS (SELECT COUNT(*) AS rows,
      |    SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS empty_text,
      |    SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS n_chars_drift,
      |    COUNT(*) - COUNT(DISTINCT doc_id) AS dup_pk FROM documents),
      |oo AS (SELECT COUNT(*) AS v FROM orders
      |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
      |ol AS (SELECT COUNT(*) AS v FROM lineitem
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |SELECT table_name, metric, CAST(value AS BIGINT) AS value FROM (
      |  SELECT 'orders' AS table_name, 'rows' AS metric, rows AS value FROM o
      |  UNION ALL SELECT 'orders', 'nulls:o_custkey', nulls_custkey FROM o
      |  UNION ALL SELECT 'orders', 'domain:o_totalprice>0', neg_price FROM o
      |  UNION ALL SELECT 'orders', 'dup_pk', dup_pk FROM o
      |  UNION ALL SELECT 'orders', 'orphans:o_custkey', v FROM oo
      |  UNION ALL SELECT 'lineitem', 'rows', rows FROM l
      |  UNION ALL SELECT 'lineitem', 'domain:l_quantity>0', neg_qty FROM l
      |  UNION ALL SELECT 'lineitem', 'dup_pk', dup_pk FROM l
      |  UNION ALL SELECT 'lineitem', 'orphans:l_orderkey', v FROM ol
      |  UNION ALL SELECT 'events', 'rows', rows FROM e
      |  UNION ALL SELECT 'events', 'nulls:user_id', nulls_user FROM e
      |  UNION ALL SELECT 'events', 'nulls:ts', nulls_ts FROM e
      |  UNION ALL SELECT 'events', 'dup_pk', dup_pk FROM e
      |  UNION ALL SELECT 'documents', 'rows', rows FROM d
      |  UNION ALL SELECT 'documents', 'domain:text_nonempty', empty_text FROM d
      |  UNION ALL SELECT 'documents', 'domain:n_chars=len', n_chars_drift FROM d
      |  UNION ALL SELECT 'documents', 'dup_pk', dup_pk FROM d)
      |ORDER BY table_name, metric""".stripMargin
}
