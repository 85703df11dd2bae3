package graft

import org.apache.spark.sql.functions._
import graft.engine.{Incremental, Tables}

/** Window/pagination algebra — the invariants the reference enforces
  * operationally (SURVEY.md §5.3): pages partition the ordered window;
  * adjacent half-open windows tile without overlap or loss. */
class IncrementalSpec extends SparkSpec {

  private def events = Tables.events(spark, sf)

  test("half-open windows tile: [a,b) ∪ [b,c) == [a,c), disjoint") {
    val a = "2024-01-03 00:00:00"; val b = "2024-01-10 00:00:00"; val c = "2024-01-17 00:00:00"
    val ab = Incremental.filterRange(events, "ts", a, b)
    val bc = Incremental.filterRange(events, "ts", b, c)
    val ac = Incremental.filterRange(events, "ts", a, c)
    assert(ab.count() + bc.count() == ac.count())
    assert(ab.intersect(bc).count() == 0)
    assert(ab.union(bc).exceptAll(ac).count() == 0)
  }

  test("filterRange zone: a NY wall-clock window == its UTC-shifted twin") {
    val e = Tables.events(spark, sf)
    // January ⇒ America/New_York is EST = UTC-5, no DST edge in-window
    val ny = Incremental.filterRange(e, "ts",
      "2024-01-08 00:00:00", "2024-01-15 00:00:00", "America/New_York")
    val shifted = Incremental.filterRange(e, "ts",
      "2024-01-08 05:00:00", "2024-01-15 05:00:00")
    assert(ny.count() > 0)
    assert(ny.count() == shifted.count())
    assert(ny.exceptAll(shifted).count() == 0)
    // bound-string round trip in the configured zone (Task.java:80-81)
    val ms = Incremental.parseWindowBound("2024-01-08 00:00:00", "America/New_York")
    assert(Incremental.windowBoundString(ms, "America/New_York") == "2024-01-08 00:00:00")
    assert(Incremental.windowBoundString(ms, "UTC") == "2024-01-08 05:00:00")
  }

  test("pages partition the ordered scan: no overlap, no loss, stable") {
    val total = events.count().toInt
    val pageSize = 137
    val pages = (0 until total by pageSize).map { off =>
      Incremental.page(events, "ts", "event_id", off, pageSize)
        .select(col("event_id"))
    }
    val reassembled = pages.reduce(_ unionAll _)
    assert(reassembled.count() == total)
    assert(reassembled.distinct().count() == total) // no duplicates across pages
  }

  test("pagination is deterministic under repeated execution") {
    val p1 = Incremental.page(events, "ts", "event_id", 300, 50)
      .select(col("event_id")).collect().map(_.getLong(0)).toSeq
    val p2 = Incremental.page(events, "ts", "event_id", 300, 50)
      .select(col("event_id")).collect().map(_.getLong(0)).toSeq
    assert(p1 == p2 && p1.size == 50)
  }

  test("latestPerKey keeps exactly one row per key, the max-ts one") {
    val out = Incremental.latestPerKey(events, "user_id", "ts", "event_id")
    val users = events.select(col("user_id")).distinct().count()
    assert(out.count() == users)
    val maxTs = events.groupBy(col("user_id")).agg(max(col("ts")).as("mx"))
    val joined = out.join(maxTs, "user_id").filter(col("ts") === col("mx"))
    assert(joined.count() == users)
  }
}
