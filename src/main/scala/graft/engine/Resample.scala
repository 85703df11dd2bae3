package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling — regularize an irregular event stream onto a
  * fixed-interval grid (the `resample().ffill()` of dataframe libraries,
  * as a distributed operator):
  *
  *   1. bucket events into the grid interval;
  *   2. aggregate per (series, bucket) — exact decimal sums;
  *   3. LEFT JOIN the aggregates onto the full bucket SPINE, so silent
  *      intervals surface as explicit rows;
  *   4. gap-fill by carry-forward (`last(..., ignoreNulls)` over an
  *      unbounded-preceding frame — Spark evaluates it in one running
  *      pass per partition, not one rescan per frame).
  *
  * Scale posture: the spine is |series| × |buckets| rows — it grows with
  * TIME, not with data volume (100 TB of events over the same month has
  * the same spine), and is built with `sequence()` + `explode` from a
  * 1-row bounds aggregate broadcast onto the series list. The whole
  * operator is 2 shuffles: the bucket aggregation and the series-keyed
  * fill window (the join between spine and aggregates lands on the same
  * key, and the tiny spine side broadcasts).
  *
  * Reference anchor: the reference's cron-windowed incremental fetch
  * (SURVEY §2a R11) slices time into fixed windows; resampling is the
  * analytical dual — fixed windows over the OUTPUT, including the windows
  * in which nothing happened (the reference simply emits nothing for an
  * empty poll; an analytics consumer needs the explicit zero row).
  */
object Resample {

  /** q_resample: hourly per-event-type activity grid over the whole
    * corpus, gaps carried forward.
    *
    * Output columns per (event_type, hour): `n_events` (0 on gaps),
    * `sum_cents` (exact integer cents, 0 on gaps), `filled_cents` (the
    * carry-forward: last non-gap hour's sum), `is_gap`. Cents are
    * computed as `floor(value·100 + 0.5)` — a pure-IEEE expression both
    * engines evaluate bit-identically (an exact integer in [1, 49002],
    * so the BIGINT sum is overflow-safe by 8 orders of magnitude). */
  def qResample(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    // x - pmod(x, H) == H-aligned floor in LONG arithmetic (Column./ on
    // longs is double division, which would shear µs precision)
    def hourFloor(c: org.apache.spark.sql.Column) = c - pmod(c, lit(HourUs))
    val hourly = Iterate.cut(events
      .withColumn("bucket_us", hourFloor(unix_micros(col("ts"))))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("sum_cents")))
    // bounds and the series universe both derive from the (tiny, cut)
    // aggregate, so the raw events table is scanned exactly ONCE — a
    // naive spine would rescan 100 TB twice more for a min/max and a
    // distinct. The spine exists even for (series, hour) cells with zero
    // events inside the observed range.
    val bounds = hourly.agg(min(col("bucket_us")).as("lo"), max(col("bucket_us")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), lit(HourUs))).as("bucket_us"))
      .crossJoin(broadcast(hourly.select(col("event_type")).distinct()))
    val fillW = Window.partitionBy(col("event_type")).orderBy(col("bucket_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "bucket_us"), "left")
      .select(col("event_type"), col("bucket_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_cents"), lit(0L)).as("sum_cents"),
        col("sum_cents").isNull.as("is_gap"),
        coalesce(last(col("sum_cents"), ignoreNulls = true).over(fillW), lit(0L))
          .as("filled_cents"))
      .orderBy(col("event_type"), col("bucket_us"))
  }

  val HourUs: Long = 3600000000L

  /** q_interpolate: the same hourly grid as q_resample, but gaps filled
    * by LINEAR interpolation between the flanking observed hours instead
    * of carry-forward — the `resample().interpolate()` dual of ffill.
    *
    * The interpolated value is computed in EXACT integer arithmetic:
    * with the previous observed hour at distance k of an n-hour gap span,
    *
    *   interp = (prev·(n−k) + next·k) div n
    *
    * — all operands are non-negative BIGINTs (event values are positive,
    * so hourly sums are), which makes Spark's `div` (truncating) and
    * DuckDB's `//` (flooring) agree, and keeps libm off the
    * hash-compared path entirely. Overflow bound: |sum_cents| · n must
    * stay under 2^63 — sums are ≤ ~5·10^4 cents per event, so a series
    * would need ~10^14 event-cents in one hour × a multi-year gap to
    * overflow; out of scope for an hourly grid (documented, not
    * guarded).
    *
    * Edge policy: a leading gap (no previous observation) backfills from
    * the next observation; a trailing gap carries the last one forward —
    * both spelled as COALESCE over the same four window columns.
    *
    * Plan shape: identical to q_resample — one raw scan, one bucket
    * aggregation shuffle, then TWO window passes over the same
    * series-keyed partitioning (Spark runs the forward-looking and
    * backward-looking frames as two Window nodes over one exchange).
    */
  def qInterpolate(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    def hourFloor(c: org.apache.spark.sql.Column) = c - pmod(c, lit(HourUs))
    val hourly = Iterate.cut(events
      .withColumn("bucket_us", hourFloor(unix_micros(col("ts"))))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("obs_cents")))
    val bounds = hourly.agg(min(col("bucket_us")).as("lo"), max(col("bucket_us")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), lit(HourUs))).as("bucket_us"))
      .crossJoin(broadcast(hourly.select(col("event_type")).distinct()))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("bucket_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("bucket_us"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("obs_cents").isNotNull, col("bucket_us"))
    spine.join(hourly, Seq("event_type", "bucket_us"), "left")
      .withColumn("prev_cents", last(col("obs_cents"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_bucket", last(obsBucket, ignoreNulls = true).over(wPrev))
      .withColumn("next_cents", first(col("obs_cents"), ignoreNulls = true).over(wNext))
      .withColumn("next_bucket", first(obsBucket, ignoreNulls = true).over(wNext))
      .select(col("event_type"), col("bucket_us"),
        col("obs_cents").isNull.as("is_gap"),
        // explicit CASE ladder: the division only ever runs on interior
        // gaps, where prev_bucket < bucket_us < next_bucket guarantees a
        // non-zero span (on observed rows the span is 0 — an eager
        // evaluation would divide by zero)
        when(col("obs_cents").isNotNull, col("obs_cents"))
          .when(col("prev_cents").isNull || col("next_cents").isNull,
            coalesce(col("prev_cents"), col("next_cents"), lit(0L)))
          .otherwise(
            expr("""(prev_cents * ((next_bucket - bucket_us) div 3600000000) +
                   | next_cents * ((bucket_us - prev_bucket) div 3600000000))
                   | div ((next_bucket - prev_bucket) div 3600000000)""".stripMargin))
          .as("interp_cents"))
      .orderBy(col("event_type"), col("bucket_us"))
  }

  /** DuckDB replay: same spine, same four windows, same integer formula.
    * NULLs propagate through the arithmetic identically, so the COALESCE
    * ladder lines up branch for branch. */
  val qInterpolateSql: String =
    """WITH b AS (
      |  SELECT (min(epoch_us(ts)) // 3600000000) * 3600000000 AS lo,
      |         (max(epoch_us(ts)) // 3600000000) * 3600000000 AS hi
      |  FROM events),
      |spine AS (
      |  SELECT t.bucket_us, s.event_type
      |  FROM (SELECT unnest(generate_series(lo, hi, 3600000000)) AS bucket_us
      |        FROM b) t
      |  CROSS JOIN (SELECT DISTINCT event_type FROM events) s),
      |hourly AS (
      |  SELECT event_type,
      |    (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
      |    SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS obs_cents
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT spine.event_type, spine.bucket_us, hourly.obs_cents,
      |    last_value(hourly.obs_cents IGNORE NULLS) OVER wp AS prev_cents,
      |    last_value(CASE WHEN hourly.obs_cents IS NOT NULL
      |                    THEN spine.bucket_us END IGNORE NULLS) OVER wp AS prev_bucket,
      |    first_value(hourly.obs_cents IGNORE NULLS) OVER wn AS next_cents,
      |    first_value(CASE WHEN hourly.obs_cents IS NOT NULL
      |                     THEN spine.bucket_us END IGNORE NULLS) OVER wn AS next_bucket
      |  FROM spine LEFT JOIN hourly
      |    ON spine.event_type = hourly.event_type
      |   AND spine.bucket_us = hourly.bucket_us
      |  WINDOW wp AS (PARTITION BY spine.event_type ORDER BY spine.bucket_us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wn AS (PARTITION BY spine.event_type ORDER BY spine.bucket_us
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_type, bucket_us, obs_cents IS NULL AS is_gap,
      |  CAST(CASE WHEN obs_cents IS NOT NULL THEN obs_cents
      |       WHEN prev_cents IS NULL OR next_cents IS NULL
      |         THEN COALESCE(prev_cents, next_cents, 0)
      |       ELSE (prev_cents * ((next_bucket - bucket_us) // 3600000000) +
      |             next_cents * ((bucket_us - prev_bucket) // 3600000000))
      |             // ((next_bucket - prev_bucket) // 3600000000)
      |  END AS BIGINT) AS interp_cents
      |FROM grid
      |ORDER BY event_type, bucket_us""".stripMargin

  /** DuckDB replay: generate_series spine × series, same carry-forward
    * (last_value IGNORE NULLS over the same frame). `epoch_us` is the
    * µs-integer bridge both engines agree on. */
  val qResampleSql: String =
    """WITH b AS (
      |  SELECT (min(epoch_us(ts)) // 3600000000) * 3600000000 AS lo,
      |         (max(epoch_us(ts)) // 3600000000) * 3600000000 AS hi
      |  FROM events),
      |spine AS (
      |  SELECT t.bucket_us, s.event_type
      |  FROM (SELECT unnest(generate_series(lo, hi, 3600000000)) AS bucket_us
      |        FROM b) t
      |  CROSS JOIN (SELECT DISTINCT event_type FROM events) s),
      |hourly AS (
      |  SELECT event_type,
      |    (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
      |    COUNT(*) AS n_events,
      |    SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS sum_cents
      |  FROM events GROUP BY 1, 2)
      |SELECT spine.event_type, spine.bucket_us,
      |  COALESCE(hourly.n_events, 0) AS n_events,
      |  CAST(COALESCE(hourly.sum_cents, 0) AS BIGINT) AS sum_cents,
      |  hourly.sum_cents IS NULL AS is_gap,
      |  CAST(COALESCE(last_value(hourly.sum_cents IGNORE NULLS) OVER (
      |    PARTITION BY spine.event_type ORDER BY spine.bucket_us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS filled_cents
      |FROM spine LEFT JOIN hourly
      |  ON spine.event_type = hourly.event_type
      | AND spine.bucket_us = hourly.bucket_us
      |ORDER BY spine.event_type, spine.bucket_us""".stripMargin
}
