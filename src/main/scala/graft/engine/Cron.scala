package graft.engine

import java.time.{Instant, ZoneId, ZoneOffset, ZonedDateTime}

/** R11: arbitrary cron scheduling — a 6-field Quartz-subset evaluator
  * replacing the reference's org.quartz.CronExpression dependency
  * (ChargeOverSourceConnectorConfig.java:59-68,159-169: expression is
  * validated at config time and evaluated in a configured timezone;
  * ChargeOverSourceTask.java:380-389: evaluation failure falls back to
  * +24 h).
  *
  * Field order matches Quartz: sec min hour day-of-month month day-of-week
  * (no optional year field). Supported per field: `*`, `?`, numerics,
  * comma lists, `a-b` ranges, and `/step` on any of those — the whole
  * surface the reference's configs exercise (`0 0 0 * * ?`,
  * confluent-cloud-config.json) plus the hourly/weekday shapes real users
  * schedule. Month/day names and `L W #` specials are NOT parsed: such an
  * expression fails `parse` and takes the reference's own +24 h fallback
  * path rather than silently misfiring.
  *
  * Day semantics: `?` == `*` (unrestricted). Quartz requires exactly one
  * of dom/dow to be `?`; if a caller restricts both anyway we require both
  * to match (the conservative reading — never fires on a day the user
  * didn't name).
  *
  * The evaluator walks calendar fields coarse-to-fine, zeroing finer
  * fields on every carry, so `nextRunAfter` is O(fields advanced), not
  * O(seconds scanned); an unsatisfiable date spec (e.g. Feb 30) exhausts
  * the guard and falls back +24 h like a parse failure would.
  */
final case class CronSchedule(
    sec: CronSchedule.Field, min: CronSchedule.Field, hour: CronSchedule.Field,
    dom: CronSchedule.Field, mon: CronSchedule.Field, dow: CronSchedule.Field,
    zone: ZoneId) extends StateMachine.Schedule {

  /** Next fire time STRICTLY after t (CronExpression.getNextValidTimeAfter). */
  def nextRunAfter(tMillis: Long): Long = {
    var z = Instant.ofEpochMilli(tMillis).atZone(zone)
      .withNano(0).plusSeconds(1)
    var guard = 0
    while (guard < 5000) { // ≥1 field advances per pass; 5000 ≫ any real spec
      guard += 1
      if (!mon.matches(z.getMonthValue))
        z = z.withDayOfMonth(1).withHour(0).withMinute(0).withSecond(0).plusMonths(1)
      else if (!dayMatches(z))
        z = z.withHour(0).withMinute(0).withSecond(0).plusDays(1)
      else if (!hour.matches(z.getHour))
        z = z.withMinute(0).withSecond(0).plusHours(1)
      else if (!min.matches(z.getMinute))
        z = z.withSecond(0).plusMinutes(1)
      else if (!sec.matches(z.getSecond))
        z = z.plusSeconds(1)
      else return z.toInstant.toEpochMilli
    }
    CronSchedule.fallback(tMillis) // unsatisfiable spec (e.g. 0 0 0 30 2 ?)
  }

  private def dayMatches(z: ZonedDateTime): Boolean = {
    // Quartz day-of-week numbering: 1=SUN..7=SAT (java.time: 1=MON..7=SUN)
    val quartzDow = z.getDayOfWeek.getValue % 7 + 1
    (dom.any, dow.any) match {
      case (true, true)   => true
      case (false, true)  => dom.matches(z.getDayOfMonth)
      case (true, false)  => dow.matches(quartzDow)
      case (false, false) => dom.matches(z.getDayOfMonth) && dow.matches(quartzDow)
    }
  }
}

object CronSchedule {

  sealed trait Field { def any: Boolean; def matches(v: Int): Boolean }
  case object AnyValue extends Field {
    val any = true; def matches(v: Int) = true
  }
  final case class ValueSet(vs: Set[Int]) extends Field {
    val any = false; def matches(v: Int): Boolean = vs(v)
  }

  private val num = "(\\d+)".r
  private val rng = "(\\d+)-(\\d+)".r

  /** One comma-separated element with optional /step; None on anything
    * out of range or unparseable (→ whole-expression parse failure). */
  private def elem(e: String, lo: Int, hi: Int): Option[Seq[Int]] = try {
    val (rangePart, step) = e.split("/", -1) match {
      case Array(r)                                => (r, 1)
      case Array(r, num(s)) if s.toInt > 0         => (r, s.toInt)
      case _                                       => return None
    }
    val bounds = rangePart match {
      case "*"       => Some((lo, hi))
      case rng(a, b) =>
        val (ai, bi) = (a.toInt, b.toInt)
        if (lo <= ai && ai <= bi && bi <= hi) Some((ai, bi)) else None
      case num(n)    =>
        val v = n.toInt
        // Quartz: a bare value with /step means "from a to max by step"
        if (lo <= v && v <= hi) Some((v, if (step > 1) hi else v)) else None
      case _         => None
    }
    bounds.map { case (a, b) => a.to(b, step) }
  } catch { case _: NumberFormatException => None } // e.g. 20-digit "numbers"

  private def parseField(tok: String, lo: Int, hi: Int): Option[Field] =
    tok match {
      case "*" | "?" => Some(AnyValue)
      case _ =>
        val parts = tok.split(",", -1).map(e => elem(e, lo, hi))
        if (parts.isEmpty || parts.exists(_.isEmpty)) None
        else Some(ValueSet(parts.flatMap(_.get).toSet))
    }

  /** Strict parse — None mirrors CronExpression's ParseException path. */
  def parse(expr: String, zone: ZoneId = ZoneOffset.UTC): Option[CronSchedule] = {
    val t = expr.trim.split("\\s+")
    if (t.length != 6) None
    else for {
      s <- parseField(t(0), 0, 59)
      m <- parseField(t(1), 0, 59)
      h <- parseField(t(2), 0, 23)
      d <- parseField(t(3), 1, 31)
      mo <- parseField(t(4), 1, 12)
      w <- parseField(t(5), 1, 7)
    } yield CronSchedule(s, m, h, d, mo, w, zone)
  }

  /** +24 h on garbage — the reference's catch-all (Task.java:386-388). */
  def fallback(tMillis: Long): Long = tMillis + 86400000L

  /** The full config-driven path: parse-or-fallback in one call, like
    * calculateNextScheduledRun wrapping config + evaluation. */
  def nextRunOrFallback(expr: String, zone: ZoneId, tMillis: Long): Long =
    parse(expr, zone).map(_.nextRunAfter(tMillis)).getOrElse(fallback(tMillis))
}
