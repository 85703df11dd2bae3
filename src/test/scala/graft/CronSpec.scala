package graft

import java.time.{ZoneId, ZoneOffset}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{CronSchedule, Incremental, StateMachine}

/** R11: 6-field Quartz-subset cron — next-fire semantics, timezone, and
  * the reference's +24 h fallback (Task.java:380-389). */
class CronSpec extends AnyFunSuite {
  private val utc = ZoneOffset.UTC
  private def at(s: String, zone: String = "UTC"): Long =
    Incremental.parseWindowBound(s, zone)

  test("default `0 0 0 * * ?` agrees with DailySchedule.midnight, iterated") {
    val c = CronSchedule.parse("0 0 0 * * ?", utc).get
    var t = at("2024-03-10 15:30:00")
    for (_ <- 0 until 10) {
      assert(c.nextRunAfter(t) == StateMachine.DailySchedule.midnight.nextRunAfter(t))
      t = c.nextRunAfter(t)
    }
  }

  test("hourly / weekday / step / list / day-of-month shapes fire correctly") {
    val hourly = CronSchedule.parse("0 0 * * * ?", utc).get
    assert(hourly.nextRunAfter(at("2024-03-10 15:30:00")) == at("2024-03-10 16:00:00"))
    // weekdays 09:30 (Quartz dow: 2-6 = MON-FRI); 2024-03-08 is a Friday,
    // so after Friday 10:00 the next fire is Monday 03-11
    val wd = CronSchedule.parse("0 30 9 ? * 2-6", utc).get
    assert(wd.nextRunAfter(at("2024-03-08 10:00:00")) == at("2024-03-11 09:30:00"))
    val q15 = CronSchedule.parse("0 */15 * * * ?", utc).get
    assert(q15.nextRunAfter(at("2024-03-10 15:31:00")) == at("2024-03-10 15:45:00"))
    val twice = CronSchedule.parse("0 0 6,18 * * ?", utc).get
    assert(twice.nextRunAfter(at("2024-03-10 07:00:00")) == at("2024-03-10 18:00:00"))
    val dom15 = CronSchedule.parse("0 0 0 15 * ?", utc).get
    assert(dom15.nextRunAfter(at("2024-03-16 00:00:00")) == at("2024-04-15 00:00:00"))
  }

  test("configured timezone: fires at wall-clock time in that zone (DST-aware)") {
    val ny = CronSchedule.parse("0 0 0 * * ?", ZoneId.of("America/New_York")).get
    // 2024-03-10 is the US DST switch: the NEXT NY midnight is 04:00 UTC (EDT)
    val next = ny.nextRunAfter(at("2024-03-10 12:00:00"))
    assert(next == at("2024-03-11 00:00:00", "America/New_York"))
    assert(next == at("2024-03-11 04:00:00"))
  }

  test("parse failures and unsatisfiable specs take the +24 h fallback") {
    val t = at("2024-03-10 12:00:00")
    for (bad <- Seq("", "not a cron", "0 0 0 * *", "0 0 25 * * ?",
        "0 0 0 L * ?", "0 0 0 * * MON", "61 0 0 * * ?", "0 0 0 * * */0",
        "0 0 0 * * 99999999999999999999"))
      assert(CronSchedule.nextRunOrFallback(bad, utc, t) == t + 86400000L, s"expr=<$bad>")
    // parseable but never satisfiable: Feb 30 — evaluator bails to fallback
    val feb30 = CronSchedule.parse("0 0 0 30 2 ?", utc).get
    assert(feb30.nextRunAfter(t) == t + 86400000L)
  }

  test("completeBatch schedules the next window through any Schedule impl") {
    import StateMachine._
    val t0 = at("2024-03-10 08:00:00")
    val s = startBatch(initial("customer", t0), t0 + 3600000L)
    val cron = CronSchedule.parse("0 0 12 * * ?", utc).get
    val done = completeBatch(s, cron)
    assert(done.nextScheduledRunMillis == at("2024-03-10 12:00:00"))
  }
}
