package graft

import org.apache.spark.sql.functions._
import graft.engine.{Funnel, Streaming, Tables}

/** Streaming funnel: the per-user greedy-earliest (t1, t2, t3) machine,
  * carried as 24 bytes of state, must equal the batch conditional-min
  * windows after a time-ordered multi-micro-batch replay. */
class FunnelStreamSpec extends SparkSpec {

  test("streamed funnel stage times == batch userStages across micro-batches") {
    val raw = Tables.eventsRaw(spark, sf)
    val cut = lit(raw.selectExpr("percentile_approx(ts, 0.5) AS c").head().get(0))
    val dir = java.nio.file.Files.createTempDirectory("graft_fun_mb").toString
    raw.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$dir/f1")
    raw.filter(col("ts") > cut).coalesce(1).write.parquet(s"$dir/f2")
    val flat = java.nio.file.Files.createTempDirectory("graft_fun_flat").toString
    var idx = 0
    for (sub <- Seq("f1", "f2"); f <- new java.io.File(s"$dir/$sub").listFiles()
         if f.getName.endsWith(".parquet")) {
      val dst = java.nio.file.Paths.get(f"$flat/part_$idx%02d.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + idx * 60000L))
      idx += 1
    }
    assert(idx == 2, s"expected 2 files, got $idx")
    val stream = Tables.normalizeTs(
      spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1").parquet(flat))
    val out = Streaming.funnelStream(Streaming.funnelEvents(stream)).toDF()
    val q = Streaming.runToMemoryUpdate(out, "funnel_stream")
    q.awaitTermination(120000)
    // each slot is write-once, so max over a user's emissions == the
    // final state (null while unset, then constant)
    val streamed = spark.table("funnel_stream")
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
    val batch = Funnel.userStages(spark, sf)
    assert(streamed.count() == batch.count(), "one state row per funnel user")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streamed stage times must equal the batch window formulation")
    // the declared query's stage counts agree with the streamed state
    val counts = Funnel.qFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("1_view") == streamed.filter(col("t1").isNotNull).count())
    assert(counts("2_click") == streamed.filter(col("t2").isNotNull).count())
    assert(counts("3_purchase") == streamed.filter(col("t3").isNotNull).count())
  }
}
