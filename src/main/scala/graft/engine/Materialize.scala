package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view upkeep
  * algebra: a rollup kept current by MERGING the new slice's partial
  * aggregates into the existing state, never by rescanning history.
  *
  * The operator demonstrates the two halves of that algebra:
  *
  *   - **mergeable metrics** (count/sum/min/max) — partials per slice,
  *     then a re-aggregate in which the slice key disappears. `avg` is
  *     deliberately NOT maintained: it is derived from (sum, count) at
  *     read time, the only correct way to keep it incremental.
  *   - **exact distinct** — NOT mergeable as a scalar, so it is kept as
  *     the two-level keyset form: distinct (group, member) keys per
  *     slice, set-union across slices, count at read. State is
  *     O(distinct keys) — the honest cost of exact MV distinct; the
  *     bounded-state alternative is the KMV sketch (q_agg_kmv), whose
  *     merge laws are ScalaCheck'd in Sketches.
  *
  * The tested contract is merge INVISIBILITY: the oracle is the flat
  * one-shot aggregate over all data — if the split+merge leaked anywhere
  * (a double-counted straddling day, a lost min, a distinct collision)
  * the hash differs. The cutoff is intentionally NOT day-aligned, so one
  * day straddles both slices and the second-level distinct/merge is
  * actually exercised.
  *
  * Scale posture: at 100 TB the "base" partial is yesterday's persisted
  * state table and the "delta" is today's arriving partition — the merge
  * costs O(|state| + |delta|), one shuffle keyed on the group columns,
  * and history is never rescanned. Here both slices derive from one scan
  * (the slice tag is a projection over a broadcast 1-row bounds
  * aggregate), so the whole query is: 1 scan, partial agg keyed
  * (slice, day, type), merge agg keyed (day, type), plus the keyset
  * pipeline on the same keys.
  *
  * Reference anchor: the reference's incremental batches
  * (ChargeOverSourceTask.java:245-291) hand each poll a disjoint time
  * slice — this operator is what a consumer does with those slices to
  * keep a rollup current without reprocessing the topic from offset 0.
  */
object Materialize {

  val DayUs: Long = 86400000000L

  /** Merge step for the mergeable metrics: re-aggregate partials so any
    * slice/tag columns outside the group key disappear. Used by the
    * query (one merge over two slices) and by MvMaintSpec (iterated
    * fold over N chronological slices == one-shot recompute). */
  def mergePartials(parts: DataFrame): DataFrame =
    parts.groupBy(col("day"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))

  /** Partial (per-slice) aggregate of the mergeable metrics. `sliceCols`
    * is prepended to the group key; pass nothing for the final shape. */
  def partialAgg(ev: DataFrame, sliceCols: Column*): DataFrame =
    ev.groupBy((sliceCols :+ col("day")) :+ col("event_type"): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))

  /** The exact-integer measure columns the rollup keys on, over any
    * normalized events frame (batch table or a foreachBatch micro-batch —
    * MvMaintSpec maintains the same rollup over the file stream). */
  def measureEvents(ev: DataFrame): DataFrame =
    ev.select(
      expr(s"unix_micros(ts) div ${DayUs}L").as("day"),
      col("event_type"), col("user_id"),
      floor(col("value") * 100.0 + 0.5).cast("long").as("cents"),
      unix_micros(col("ts")).as("us"))

  def measured(spark: SparkSession, sfDir: String): DataFrame =
    measureEvents(Tables.events(spark, sfDir))

  /** q_incr_agg: the daily (day × event_type) rollup maintained as
    * base-state + delta-merge, output identical to a full recompute.
    * Cutoff = lo + 4·(hi−lo)/5 of the observed µs range (integer
    * arithmetic, deliberately unaligned to days). */
  def qIncrAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Iterate.cut(measured(spark, sfDir))
    val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .select(expr("lo + (hi - lo) * 4 div 5").as("cutoff_us"))
    // slice tag via the broadcast 1-row bounds: ONE pass over events
    // feeds both the base and delta partials.
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("slice", when(col("us") < col("cutoff_us"), lit("base"))
        .otherwise(lit("delta")))
    val merged = mergePartials(partialAgg(tagged, col("slice")))
    // exact distinct, two-level: per-slice keysets, set-union, count.
    // The straddling day proves the union dedups across slices.
    val keysets = tagged.select(col("slice"), col("day"), col("event_type"),
      col("user_id")).distinct()
    val users = keysets.select(col("day"), col("event_type"), col("user_id"))
      .distinct()
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    merged.join(users, Seq("day", "event_type"))
      .select(col("day"), col("event_type"), col("n_events"),
        col("sum_cents"), col("min_cents"), col("max_cents"),
        expr("sum_cents div n_events").as("avg_cents"), col("n_users"))
      .orderBy(col("day"), col("event_type"))
  }

  /** The oracle never sees the split: a flat one-shot aggregate. Equality
    * IS the maintenance proof. */
  val qIncrAggSql: String =
    """WITH ev AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, event_type, user_id,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      |  FROM events)
      |SELECT day, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  MIN(cents) AS min_cents,
      |  MAX(cents) AS max_cents,
      |  CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_cents,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM ev GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin
}
