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

  test("multi-micro-batch replay: state evolves across files (maxFilesPerTrigger=1)") {
    // the reference's catch-up: several windows processed back-to-back,
    // state carried between them — here two parquet files become two
    // micro-batches and the state store carries the counts across
    val dir = java.nio.file.Files.createTempDirectory("graft_mb").toString
    val e = Tables.events(spark, sf)
    // write the RAW (nanos-as-long) form: the stream reads with the raw
    // schema, and a converted TimestampType column would round-trip as
    // INT96 and no longer match
    val raw = Tables.eventsRaw(spark, sf)
    raw.filter(col("event_id") < 500).write.parquet(s"$dir/f1")
    raw.filter(col("event_id") >= 500).write.parquet(s"$dir/f2")
    // flatten into one dir as two files
    val flat = java.nio.file.Files.createTempDirectory("graft_mb_flat").toString
    var idx = 0
    for (sub <- Seq("f1", "f2"); f <- new java.io.File(s"$dir/$sub").listFiles()
         if f.getName.endsWith(".parquet")) {
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(s"$flat/part_$idx.parquet"))
      idx += 1
    }
    assert(idx >= 2, "need at least two files for two micro-batches")
    val schema = Tables.eventsRaw(spark, sf).schema
    val rawStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat)
    val stream = Tables.normalizeTs(rawStream)
    val out = Streaming.upsertLatest(Streaming.typedEvents(stream)).toDF()
    val q = Streaming.runToMemoryUpdate(out, "multibatch_test")
    q.awaitTermination(120000)
    assert(q.recentProgress.length >= 2, "expected multiple micro-batches")
    // total seen across final per-key states == total events
    val finalCounts = spark.table("multibatch_test")
      .groupBy(col("user_id")).agg(max(col("nSeen")).as("n"))
    val total = finalCounts.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total == e.count(), s"state must have seen every event, got $total")
  }

  test("TTL upsert evicts idle keys with a final snapshot across micro-batches") {
    // batch 1: all users; batch 2 (same stream, next file): only users
    // 0-4 — by then every key's 1ms TTL has lapsed, so keys absent from
    // batch 2 must surface once as evicted=true and leave the store
    val raw = Tables.eventsRaw(spark, sf)
    val flat = java.nio.file.Files.createTempDirectory("graft_ttl").toString
    raw.coalesce(1).write.parquet(s"$flat/stage1")
    raw.filter(col("user_id") < 5).coalesce(1).write.parquet(s"$flat/stage2")
    var idx = 0
    for (sub <- Seq("stage1", "stage2");
         f <- new java.io.File(s"$flat/$sub").listFiles()
         if f.getName.endsWith(".parquet")) {
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(s"$flat/batch_$idx.parquet"))
      idx += 1
    }
    val schema = raw.schema
    val rawStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$flat/batch_*.parquet")
    val stream = Tables.normalizeTs(rawStream)
    val out = Streaming.upsertLatestTtl(Streaming.typedEvents(stream), ttlMs = 1L).toDF()
    val perUserCount = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val q = Streaming.runToMemoryUpdate(out, "ttl_test")
    // evictions arrive in no-data batches after the data is done; whether
    // AvailableNow then self-terminates is timing-dependent, so poll the
    // sink for the expected eviction count and stop the query explicitly
    try {
      def evictedUsers(): Long = spark.table("ttl_test")
        .filter(col("evicted")).select(col("user_id")).distinct().count()
      val deadline = System.currentTimeMillis + 180000
      while (evictedUsers() < perUserCount && System.currentTimeMillis < deadline)
        Thread.sleep(500)
      assert(evictedUsers() == perUserCount,
        s"all $perUserCount keys must evict, saw ${evictedUsers()}")
    } finally q.stop()
    val t = spark.table("ttl_test")
    // AvailableNow ends with a no-data batch that advances processing
    // time, so EVERY key eventually evicts — the discriminating signal is
    // the eviction snapshot's nSeen: users < 5 were replayed in batch 2,
    // so their state must have survived batch 1's TTL arm and counted
    // both passes; users >= 5 evict with only their batch-1 count.
    val perUser = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n1"))
    val evicted = t.filter(col("evicted"))
      .groupBy(col("user_id")).agg(max(col("nSeen")).as("nSeen"))
    assert(evicted.count() == perUser.count(),
      "every key must evict exactly once by stream end")
    val wrong = evicted.join(perUser, "user_id")
      .filter((col("user_id") < 5 && col("nSeen") =!= col("n1") * 2) ||
              (col("user_id") >= 5 && col("nSeen") =!= col("n1")))
    assert(wrong.count() == 0,
      "eviction snapshots must carry the full per-key seen count")
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
