package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-shaped anomaly detection: flag events whose value deviates
  * from the TRAILING per-series distribution — the self-tuning data-drift
  * monitor of a pipeline (a fixed threshold goes stale; a trailing-window
  * z-score tracks the series).
  *
  * The decision rule is evaluated ENTIRELY in integer arithmetic. The
  * usual rolling z-score (`abs(x - avg) > 3·stddev`) puts two
  * floating-point aggregates on the decision path, and Spark and any
  * other engine disagree in the last ulps (different summation trees,
  * Welford vs naive variance) — fine for a monitor, fatal for a
  * hash-compared oracle, and genuinely flaky for rows sitting ON the
  * threshold. Clearing the denominators fixes both: with cents
  * c = floor(value·100 + 0.5) (an exact integer both engines compute
  * bit-identically from the same IEEE double),
  *
  *   |x − μ| > 3σ   ⇔   (n·x − s)² > 9·(n·s2 − s²)        [n > 0]
  *
  * where s = Σc, s2 = Σc² over the trailing window — all BIGINT, exact,
  * engine-independent. Magnitudes: c ≤ 5·10⁴, so over a 100-row window
  * s ≤ 5·10⁶, s2 ≤ 2.5·10¹¹, and both squared terms stay ≤ ~2.5·10¹³ —
  * eight orders below the long boundary even under ANSI checks.
  *
  * Scale posture: one shuffle on the series key; the trailing frame is
  * O(1) running state per row (Spark's bounded-preceding ROWS frame), so
  * a series with a billion events streams through without materializing
  * windows. The same rule runs incrementally under
  * mapGroupsWithState with a 100-deep ring buffer per key.
  */
object Anomaly {

  /** q_anomaly: per-event-type trailing-100 z-score gate (|z| > 3, at
    * least 30 trailing points), emitting the flagged events. The frame
    * EXCLUDES the current row (100 preceding → 1 preceding): the event is
    * judged against the distribution BEFORE it — including itself would
    * shrink its own deviation and mask the very spike being detected.
    *
    * 100 TB shape (round-6 rework): `Window.partitionBy(event_type)` is a
    * 5-value key, i.e. one task per SERIES — the whole table funnels
    * through 5 single-task sorts (measured 61 s at the 100× dir; at
    * 100 TB a series is one executor-killing task). The trailing frame is
    * therefore rebuilt from BigWindow's chunked per-group prefix sums:
    * with per-series rank i and inclusive prefixes P(i) = Σc, Q(i) = Σc²,
    *
    *   n  = min(i − 1, 100)
    *   s  = (P(i) − cᵢ) − P(i − 101)       [P(j ≤ 0) = 0]
    *   s2 = (Q(i) − cᵢ²) − Q(i − 101)
    *
    * P(i−101)/Q(i−101) come from ONE hash equi-join of the frame with
    * itself on (series, rank − 101) — uniform keys, full parallelism.
    * Decision rule and output are UNCHANGED (same oracle): 61 s → ~19 s
    * at the 100× dir, and — the point — no single-task stage survives in
    * the plan, so the 1000-executor run parallelizes instead of funneling
    * one task per series. */
  def qAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = floor(col("value") * 100.0 + 0.5).cast("long")
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("ts"), cents.as("c"))
    val pref = BigWindow.groupPrefixSummed(base,
      Seq(col("event_type")), Seq(col("ts"), col("event_id")),
      Seq(col("c"), col("c") * col("c")))
    val back = pref.select(col("event_type").as("_bt"),
      col("_grank").as("_brank"), col("_gps0").as("_bp"), col("_gps1").as("_bp2"))
    pref
      .join(back, col("event_type") === col("_bt") &&
        (col("_grank") - 101L) === col("_brank"), "left")
      .withColumn("n", least(col("_grank") - 1L, lit(100L)))
      .withColumn("s",
        (col("_gps0") - col("c")) - coalesce(col("_bp"), lit(0L)))
      .withColumn("s2",
        (col("_gps1") - col("c") * col("c")) - coalesce(col("_bp2"), lit(0L)))
      .filter(col("n") >= 30 &&
        (col("n") * col("c") - col("s")) * (col("n") * col("c") - col("s")) >
        lit(9L) * (col("n") * col("s2") - col("s") * col("s")))
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("c").as("cents"),
        col("n").as("n_trailing"))
      .orderBy(col("event_id"))
  }

  // --- streaming twin -----------------------------------------------------

  case class AnomIn(event_id: Long, event_type: String, tsMicros: Long, cents: Long)
  /** Ring of the trailing ≤100 cents plus running Σc / Σc² — O(1) update
    * per event, ~800 B per live series key in the state store. */
  case class AnomRing(ring: Vector[Long], s: Long, s2: Long)
  case class AnomHit(event_id: Long, event_type: String, tsMicros: Long,
    cents: Long, n_trailing: Long)

  /** The SAME integer decision rule evaluated incrementally with
    * per-series keyed state — the monitoring deployment of q_anomaly: a
    * 100-deep ring buffer per key, each event judged against the ring
    * BEFORE being pushed into it. Batch rows are sorted by (ts, event_id)
    * inside each micro-batch and the caller replays files in time order —
    * the same ordered-replay contract as sessionizeStream; under that
    * contract stream output == the batch window formulation exactly
    * (spec'd), because both see identical trailing windows.
    *
    * State is bounded: 100 longs + 2 running sums per live series,
    * independent of stream length — the O(1)-state property the batch
    * ROWS frame has, carried to the continuous form. */
  def anomalyStream(events: org.apache.spark.sql.Dataset[AnomIn]):
      org.apache.spark.sql.Dataset[AnomHit] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomRing, AnomHit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[AnomIn], state: GroupState[AnomRing]) =>
          var st = state.getOption.getOrElse(AnomRing(Vector.empty, 0L, 0L))
          val out = Vector.newBuilder[AnomHit]
          for (e <- rows.toSeq.sortBy(r => (r.tsMicros, r.event_id))) {
            val n = st.ring.size.toLong
            if (n >= 30) {
              val d = n * e.cents - st.s
              if (d * d > 9L * (n * st.s2 - st.s * st.s))
                out += AnomHit(e.event_id, key, e.tsMicros, e.cents, n)
            }
            val pushed =
              if (st.ring.size == 100)
                AnomRing(st.ring.tail :+ e.cents,
                  st.s - st.ring.head + e.cents,
                  st.s2 - st.ring.head * st.ring.head + e.cents * e.cents)
              else AnomRing(st.ring :+ e.cents, st.s + e.cents,
                st.s2 + e.cents * e.cents)
            st = pushed
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Events in the stream gate's typed shape (cents exactly as the batch
    * query computes them). */
  def anomInEvents(df: DataFrame): org.apache.spark.sql.Dataset[AnomIn] = {
    import df.sparkSession.implicits._
    df.select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .as[AnomIn]
  }

  val qAnomalySql: String =
    """WITH c AS (
      |  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM events),
      |t AS (
      |  SELECT event_id, event_type, ts_us, c,
      |    COUNT(c) OVER w AS n, SUM(c) OVER w AS s, SUM(c * c) OVER w AS s2
      |  FROM c
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
      |    ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING))
      |SELECT event_id, event_type, ts_us, c AS cents, n AS n_trailing
      |FROM t
      |WHERE n >= 30 AND (n * c - s) * (n * c - s) > 9 * (n * s2 - s * s)
      |ORDER BY event_id""".stripMargin
}
