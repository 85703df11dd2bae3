package graft

import graft.engine.StateMachine._

/** The reference's control-plane semantics, pinned as unit properties
  * (ChargeOverSourceTask.java citations in StateMachine.scala). */
class StateMachineSpec extends SparkSpec {

  private val t0 = 1700000000000L // some UTC instant
  private val hour = 3600000L

  test("INITIAL_LOAD is always ready; INCREMENTAL waits for schedule") {
    val s = initial("customer", t0)
    assert(isReady(s, t0))
    val done = completeBatch(startBatch(s, t0 + hour), DailySchedule.midnight)
    assert(done.loadMode == IncrementalLoad)
    assert(!isReady(done, done.nextScheduledRunMillis - 1))
    assert(isReady(done, done.nextScheduledRunMillis))
  }

  test("mode flips INITIAL->INCREMENTAL exactly once, last := batch end") {
    val s = initial("customer", t0)
    val b = startBatch(s, t0 + hour)
    assert(b.isProcessingBatch && b.batchEndMillis.contains(t0 + hour))
    val done = completeBatch(b, DailySchedule.midnight)
    assert(done.loadMode == IncrementalLoad)
    assert(done.lastProcessedMillis == t0 + hour)
    assert(!done.isProcessingBatch && done.batchEndMillis.isEmpty)
    // second completion stays INCREMENTAL
    val again = completeBatch(startBatch(done, t0 + 2 * hour), DailySchedule.midnight)
    assert(again.loadMode == IncrementalLoad)
    assert(again.lastProcessedMillis == t0 + 2 * hour)
  }

  test("windows tile across batches: next window starts at previous end") {
    val s = initial("events", t0)
    val d1 = completeBatch(startBatch(s, t0 + hour), DailySchedule.midnight)
    val b2 = startBatch(d1, t0 + 5 * hour)
    assert(d1.lastProcessedMillis == t0 + hour)       // window 2 = [end1, now2)
    assert(b2.batchEndMillis.contains(t0 + 5 * hour))
  }

  test("daily schedule fires strictly after t at the configured UTC time") {
    val sched = DailySchedule(0, 0)
    val next = sched.nextRunAfter(t0)
    assert(next > t0 && next % 86400000L == 0)
    assert(next - t0 <= 86400000L)
    // firing exactly at midnight schedules the NEXT midnight
    assert(sched.nextRunAfter(next) == next + 86400000L)
  }

  test("backoff: 2^n seconds capped at 30s, +10% jitter; 429 flat 60s") {
    assert(backoffMillis(1, rateLimited = false, 0.0) == 2000L)
    assert(backoffMillis(3, rateLimited = false, 0.0) == 8000L)
    assert(backoffMillis(10, rateLimited = false, 0.0) == 30000L) // cap
    assert(backoffMillis(2, rateLimited = false, 1.0) == 4400L)   // +10%
    assert(backoffMillis(1, rateLimited = true, 0.7) == 60000L)
  }

  test("advance accumulates page offsets; failureReset abandons the batch") {
    val b = startBatch(initial("e", t0), t0 + hour)
    val adv = advance(advance(b, 500), 500)
    assert(adv.currentOffset == 1000L)
    val reset = failureReset(adv, t0 + 2 * hour)
    assert(!reset.isProcessingBatch && reset.currentOffset == 0)
    assert(reset.nextScheduledRunMillis == t0 + 2 * hour + 86400000L)
  }

  test("batchFrame applies the half-open window and piggybacks state") {
    val s1 = startBatch(initial("orders", 820454400000L), 852076800000L)
    val df = batchFrame(spark, sf, s1, "o_orderdate")
    assert(df.count() > 0)
    import org.apache.spark.sql.functions._
    val bad = df.filter(col("o_orderdate") < timestamp_millis(lit(820454400000L)) ||
      col("o_orderdate") >= timestamp_millis(lit(852076800000L)))
    assert(bad.count() == 0)
    val r = df.limit(1).collect()(0)
    assert(r.getAs[String]("_load_mode") == "INITIAL_LOAD")
    assert(r.getAs[Long]("_batch_end_datetime") == 852076800000L)
  }
}
