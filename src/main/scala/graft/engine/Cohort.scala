package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cohort retention — the canonical product-analytics rollup: users
  * grouped by the week they first appeared (their cohort), then for each
  * later week the count of cohort members still active. The output is the
  * retention matrix (cohort_week × week_offset → users) every analytics
  * stack derives from an event stream.
  *
  * Week indices are exact integer arithmetic on epoch micros (`div` —
  * integral division, never a double on the path), anchored at the
  * stream origin, so both engines bucket identically.
  *
  * Scale posture: three aggregates that all key on user_id — the
  * first-touch min, the distinct (user, week) activity set, and the final
  * matrix rollup. The first two share one shuffle partitioning on
  * user_id; the cohort join is a self-join on that same key (no
  * re-partition), and only the LAST aggregate re-keys to the (tiny)
  * matrix coordinates. State never exceeds one row per (user, week) —
  * at 100 TB the matrix itself is ~thousands of cells regardless of
  * event volume.
  */
object Cohort {

  /** Monday 2024-01-01 00:00 UTC in epoch µs — the week-0 anchor. */
  val OriginUs: Long = 1704067200000000L
  val WeekUs: Long = 7L * 86400L * 1000000L

  /** q_cohort: weekly retention matrix over the events stream. */
  def qCohort(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr(s"(unix_micros(ts) - ${OriginUs}L) div ${WeekUs}L").as("week"))
    val firstTouch = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val active = ev.distinct()
    active.join(firstTouch, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val qCohortSql: String =
    """WITH ev AS (
      |  SELECT user_id, (epoch_us(ts) - 1704067200000000) // 604800000000 AS week
      |  FROM events),
      |first_touch AS (
      |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id),
      |active AS (SELECT DISTINCT user_id, week FROM ev)
      |SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
      |  COUNT(DISTINCT a.user_id) AS n_users
      |FROM active a JOIN first_touch f USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin
}
