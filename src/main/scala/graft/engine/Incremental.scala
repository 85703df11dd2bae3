package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's incremental-load data path re-expressed as Spark
  * operators (SURVEY.md §2a R1-R10).
  *
  * The reference fetches half-open datetime windows
  * `[last_processed, batch_end)` with a pushed-down predicate
  * (`where=f:GTE:a,f:LT:b`, ChargeOverApiClient.java:94-112), stable ASC
  * order (`order=f:ASC`, :115-116) and limit/offset pagination (:88-89).
  * Here each of those is a declarative DataFrame op, so Catalyst pushes the
  * range filter into the parquet scan (visible as `PushedFilters` in
  * `.explain`) and plans sort+limit as `TakeOrderedAndProject` — no full
  * sort materializes at 100 TB.
  */
object Incremental {

  /** R2/R10: half-open datetime window `ts >= start && ts < end` — exactly
    * the reference's GTE/LT pair. The predicate reaches the parquet scan
    * (PushedFilters), so at scale only matching row groups are read; with
    * date-partitioned layout this becomes partition pruning.
    *
    * `zone` mirrors `chargeover.timezone` (Config.java:64-68, default UTC;
    * Task.java:80-81 renders window bounds in the configured zone): the
    * bound strings are wall-clock datetimes IN that zone, converted to the
    * instant once at plan time — the scan still sees a plain timestamp
    * range, so pushdown is unaffected. */
  def filterRange(df: DataFrame, tsCol: String, start: String, end: String,
      zone: String = "UTC"): DataFrame = {
    def bound(s: String) =
      if (zone == "UTC") to_timestamp(lit(s))
      else to_utc_timestamp(to_timestamp(lit(s)), zone)
    df.filter(col(tsCol) >= bound(start) && col(tsCol) < bound(end))
  }

  /** The reference's datetime-string rendering of a window bound:
    * `yyyy-MM-dd HH:mm:ss` formatted in the configured zone
    * (SimpleDateFormat + setTimeZone, Task.java:80-81,
    * Config.java:190-209 validation). Pure helper for offset/state
    * round-trips. */
  def windowBoundString(epochMillis: Long, zone: String = "UTC"): String =
    java.time.Instant.ofEpochMilli(epochMillis)
      .atZone(java.time.ZoneId.of(zone))
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Inverse: parse a wall-clock bound string in `zone` to epoch millis —
    * windowBoundString ∘ parseWindowBound == identity on whole seconds. */
  def parseWindowBound(s: String, zone: String = "UTC"): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .atZone(java.time.ZoneId.of(zone)).toInstant.toEpochMilli

  /** R3/R4: one "page" of an ordered incremental scan. The reference pages
    * by `order=ts:ASC` + limit/offset (ChargeOverApiClient.java:88-116);
    * ties in `ts` would make offset/limit nondeterministic, so we add the
    * unique id as tiebreak (SURVEY §7 "deterministic pagination").
    * Spark plans orderBy+offset+limit without a global sort of the full
    * table (AQE/TakeOrdered), so a page over 100 TB stays cheap. */
  def page(df: DataFrame, tsCol: String, idCol: String, offset: Int, limit: Int): DataFrame =
    df.orderBy(col(tsCol).asc, col(idCol).asc).offset(offset).limit(limit)

  /** §2a quirk: the reference's stream is an upsert changelog keyed by
    * entity id (ChargeOverSourceTask.java:431-432) — compaction = latest
    * record per key. One shuffle on the key; at scale this is the standard
    * window-dedup (no driver-side state). */
  def latestPerKey(df: DataFrame, keyCol: String, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  // ---- declared queries -------------------------------------------------

  /** q_filter_range: one incremental window over `events`. */
  def qFilterRange(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    filterRange(e, "ts", "2024-01-08 00:00:00", "2024-01-15 00:00:00")
      .select(
        col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
  }

  val qFilterRangeSql: String =
    """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
      |ORDER BY event_id""".stripMargin

  /** q_incremental_pages: page 2 (offset 200, limit 100) of the ordered
    * scan — the reference's pagination contract with deterministic ties. */
  def qIncrementalPages(spark: SparkSession, sfDir: String): DataFrame =
    page(Tables.events(spark, sfDir), "ts", "event_id", 200, 100)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"))

  val qIncrementalPagesSql: String =
    """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
      |FROM events ORDER BY ts ASC, event_id ASC LIMIT 100 OFFSET 200""".stripMargin

  /** q_dedup_latest: latest event per user (upsert-changelog compaction). */
  def qDedupLatest(spark: SparkSession, sfDir: String): DataFrame =
    latestPerKey(Tables.events(spark, sfDir), "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))

  val qDedupLatestSql: String =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin
}
