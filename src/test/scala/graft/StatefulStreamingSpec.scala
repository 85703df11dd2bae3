package graft

import org.apache.spark.sql.functions._
import graft.engine.{Streaming, Tables}

/** Arbitrary stateful streaming: flatMapGroupsWithState keeps the latest
  * record per key — the state-store form of the reference's per-entity
  * state map + changelog compaction. */
class StatefulStreamingSpec extends SparkSpec {

  test("streaming upsertLatest state equals batch latestPerKey") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = Streaming.streamEvents(spark, sf, dir)
    val out = Streaming.upsertLatest(Streaming.typedEvents(stream)).toDF()
    val q = Streaming.runToMemoryUpdate(out, "upsert_test")
    q.awaitTermination(120000)
    val streamed = spark.table("upsert_test")
      .groupBy(col("user_id"))
      .agg(max(struct(col("lastTsMicros"), col("eventType"))).as("s"))
      .select(col("user_id"), col("s.lastTsMicros").as("ts_us"))
    val batch = graft.engine.Incremental
      .latestPerKey(Tables.events(spark, sf), "user_id", "ts", "event_id")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0,
      "every streamed latest-ts must match the batch compaction")
  }

  test("seen-count accumulates all events per key") {
    import spark.implicits._
    val evs = Seq(
      Streaming.EventIn(1L, 100L, "a"), Streaming.EventIn(1L, 200L, "b"),
      Streaming.EventIn(2L, 50L, "c")).toDS()
    val out = Streaming.upsertLatest(evs).collect().map(o => o.user_id -> o).toMap
    assert(out(1L).nSeen == 2 && out(1L).eventType == "b" && out(1L).lastTsMicros == 200L)
    assert(out(2L).nSeen == 1 && out(2L).eventType == "c")
  }
}
