package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{BigWindow, Relational, Tables}

/** Pins BigWindow's distributed (rank, n) — and the ntile / percent_rank
  * arithmetic derived from them — to Spark's builtin window functions,
  * including single-row groups, groups smaller than the tile count, and
  * chunk boundaries straddling a group edge. */
class BigWindowSpec extends SparkSpec {

  test("qWindowMisc equals the direct Window formulation on orders") {
    val ours = Relational.qWindowMisc(spark, sf)
      .orderBy(col("o_orderkey")).collect()
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val direct = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("top_key", first_value(col("o_orderkey")).over(w))
      .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(w))
      .orderBy(col("o_orderkey")).collect()
    assert(ours.length == direct.length && ours.length > 0)
    ours.zip(direct).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("prefixSummed equals the single-task global running sum") {
    import spark.implicits._
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    val df = (1 to 5000).map(i => (i.toLong, math.abs(next()) % 500))
      .toDF("k", "v")
    val ours = BigWindow.prefixSummed(df, Seq(col("k")), col("v"), 13)
      .orderBy(col("k")).select(col("k"), col("_psum")).collect()
    val direct = df.withColumn("_psum",
        sum(col("v")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("k")).select(col("k"), col("_psum")).collect()
    assert(ours.toSeq == direct.toSeq)
  }

  test("qPackSequences: budget law and determinism") {
    // row ORDER is not part of the contract (scaffolding sorts dropped —
    // the driver sorts output itself), so compare value sets keyed by doc_id
    def run() = engine.Curation.qPackSequences(spark, sf).collect()
      .sortBy(_.getLong(0))
    val packed = run()
    assert(packed.nonEmpty)
    // seq_offset < budget always; a doc starts in seq floor(cum/budget)
    packed.foreach { r =>
      val off = r.getLong(r.fieldIndex("seq_offset"))
      assert(off >= 0 && off < 2048, r)
    }
    // deterministic across runs (values, per doc)
    val again = run()
    assert(packed.toSeq == again.toSeq)
    // every sequence id between 0 and max is populated (greedy never
    // skips a bucket) and totals line up with the token sum
    val seqs = packed.map(_.getLong(packed.head.fieldIndex("seq_id"))).distinct.sorted
    assert(seqs.head == 0L && seqs.last == seqs.length - 1L)
  }

  test("ranked accepts computed group expressions (upper(col))") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("A", 2L), ("b", 3L), ("B", 4L), ("b", 5L))
      .toDF("g", "k")
    val ours = BigWindow.ranked(df, Seq(upper(col("g"))), Seq(col("k")), 3)
      .select(col("g"), col("k"), col("_grank"), col("_gn"))
      .orderBy(col("k")).collect()
    val w = Window.partitionBy(upper(col("g"))).orderBy(col("k"))
    val direct = df
      .withColumn("_grank", row_number().over(w).cast("long"))
      .withColumn("_gn",
        count(lit(1)).over(Window.partitionBy(upper(col("g")))))
      .select(col("g"), col("k"), col("_grank"), col("_gn"))
      .orderBy(col("k")).collect()
    assert(ours.toSeq == direct.toSeq)
  }

  test("chunked frame is pinned: branches read ONE persisted materialization") {
    import spark.implicits._
    // RangePartitioner's sampling seed is rdd-id-dependent; without the
    // persist, a broken exchange-reuse would hand the offset branch and
    // the main branch different chunk boundaries. Both branches (plus the
    // group-metadata branch) must read the in-memory relation. The public
    // `ranked` cuts the result to a leaf, so the assertion runs on the
    // inner lazy build.
    val df = (1 to 1000).map(i => ("g" + (i % 3), i.toLong)).toDF("grp", "k")
    val (pin, r) = BigWindow.rankedPinned(df, Seq(col("grp")), Seq(col("k")), 5)
    try {
      r.collect()
      val plan = r.queryExecution.executedPlan.toString
      val cacheScans = "InMemoryTableScan|TableCacheQueryStage".r
        .findAllIn(plan).length
      assert(cacheScans >= 2, s"expected >=2 cache scans, got $cacheScans in:\n$plan")
    } finally pin.unpersist(blocking = false)
  }

  test("two concurrent BigWindow queries hold independent pins, both correct") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // The old process-global single-slot pin meant a second in-flight call
    // would unpersist the first call's chunked frame mid-job, letting the
    // two plan branches recompute DIFFERENT range-partitioner boundaries.
    // Per-call pins make interleaved queries safe.
    val dfA = (1 to 4000).map(i => ("a" + (i % 5), i.toLong)).toDF("grp", "k")
    val dfB = (1 to 4000).map(i => ("b" + (i % 7), -i.toLong)).toDF("grp", "k")
    def rankOf(df: org.apache.spark.sql.DataFrame) =
      BigWindow.ranked(df, Seq(col("grp")), Seq(col("k")), 9)
        .select(col("grp"), col("k"), col("_grank"), col("_gn"))
        .orderBy(col("grp"), col("k")).collect().toSeq
    val (ours1, ours2) = Await.result(
      Future(rankOf(dfA)).zip(Future(rankOf(dfB))), 5.minutes)
    def direct(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("grp")).orderBy(col("k"))
      df.withColumn("_grank", row_number().over(w).cast("long"))
        .withColumn("_gn", count(lit(1)).over(Window.partitionBy(col("grp"))))
        .orderBy(col("grp"), col("k")).collect().toSeq
    }
    assert(ours1 == direct(dfA))
    assert(ours2 == direct(dfB))
  }

  test("ranked matches row_number/count over adversarial group sizes") {
    import spark.implicits._
    // group sizes 1, 2, 3 (< ntile k), 4, and 997 (straddles every chunk)
    var s = 0x2545F4914F6CDD1DL
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    val data = Seq(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 997).flatMap {
      case (g, sz) => (1 to sz).map(_ => (s"g$g", next()))
    }
    val df = data.toDF("grp", "k")
    val ours = BigWindow.ranked(df, Seq(col("grp")), Seq(col("k")), 7)
      .select(col("grp"), col("k"), col("_grank"), col("_gn"),
        BigWindow.ntileOf(4, col("_grank"), col("_gn")).as("nt"),
        BigWindow.percentRank(col("_grank"), col("_gn")).as("pr"))
      .orderBy(col("grp"), col("k")).collect()
    val w = Window.partitionBy(col("grp")).orderBy(col("k"))
    val direct = df
      .withColumn("_grank", row_number().over(w).cast("long"))
      .withColumn("_gn", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .withColumn("nt", ntile(4).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .orderBy(col("grp"), col("k")).collect()
    assert(ours.length == direct.length)
    ours.zip(direct).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }
}
