package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed rank over LOW-CARDINALITY window partitions.
  *
  * `Window.partitionBy(k)` plans one task per distinct key: with a 5-value
  * key over a 100 TB fact table, every ranking function funnels the whole
  * table through 5 single-task sorts — the first plan to die at scale
  * (measured: q_window_misc was the slowest non-dedup query at sf10).
  * This is the classic scale-out alternative: chunk the GLOBAL
  * (group, order) sort order uniformly, rank within chunks, and stitch
  * chunk offsets with metadata-sized aggregations.
  *
  *   1. `repartitionByRange` on (group ++ order) — Spark's range
  *      partitioner samples bounds, so chunks are uniform regardless of
  *      group skew, and each chunk holds a contiguous slice of the global
  *      order;
  *   2. `row_number` windowed BY CHUNK ID — ~rows/numChunks per task, no
  *      skew (one hash shuffle of only the projected columns);
  *   3. chunk row-counts → running offsets (a numChunks-row aggregate,
  *      broadcast back): global row number = chunk offset + local rank;
  *   4. per-group count + first global row number (a |groups|-row
  *      aggregate, broadcast back): rank within group = global row number
  *      − group start + 1.
  *
  * Requires a TIE-FREE (total) ordering — callers append a unique key to
  * `order`, exactly what deterministic output needs anyway. With unique
  * orderings rank = row_number and `percent_rank = (rank−1)/(n−1)`,
  * `ntile` follow arithmetically from (rank, n) — same formulas Spark's
  * window evaluators use, pinned to the builtins by BigWindowSpec.
  */
object BigWindow {

  /** The chunked frame is referenced from TWO plan branches (local
    * ranks/sums, and the chunk-offset aggregate). `RangePartitioner`
    * samples with an rdd-id-dependent seed, so if the planner ever
    * recomputes the range exchange instead of reusing it, the branches
    * see DIFFERENT chunk boundaries and ranks / prefix sums silently
    * corrupt. A persisted frame pins ONE materialization for both
    * branches regardless of exchange-reuse decisions (MEMORY_AND_DISK:
    * an evicted block must spill, not drop-and-recompute — recompute is
    * exactly the divergence being prevented). The broadcast-offsets
    * subtree runs as its own job first, fully populating the cache
    * before the main branch reads it.
    *
    * The pin is SCOPED TO THE CALL (materialize-then-release, the same
    * pattern as the LlmOps pipelines): the result is cut to a
    * materialized leaf while the pin is alive, then the pin is dropped —
    * so concurrent BigWindow queries in one session each hold their own
    * pin and cannot unpersist each other's chunked frame mid-job, and
    * nothing lingers in the cache manager after the call returns.
    *
    * The cut is deliberate about failure semantics: a lazily-persisted
    * result would RECOMPUTE on partition loss — through a fresh range
    * exchange with fresh sampled bounds, i.e. exactly the silent
    * divergence the pin exists to prevent. Iterate.cut gives either a
    * reliable checkpoint (cluster: checkpoint dir set, replayable from
    * HDFS) or an eager localCheckpoint (local mode: executor loss fails
    * the job loudly instead of recomputing wrongly) — correct-or-fail,
    * never silently wrong. */
  private def pinned(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Appends `_grank` (1-based rank of the row within its group under
    * `order`) and `_gn` (group size) — both BIGINT — to `df`. The result
    * is eagerly materialized (a leaf): the chunk pin lives exactly as
    * long as the call.
    *
    * `group` may contain computed expressions (`upper(col)`): each group
    * expression is aliased to a generated `_g{i}` column up front, so the
    * group-metadata equi-join binds by name instead of re-parsing
    * `Column.toString` (which only resolves bare references). */
  def ranked(df: DataFrame, group: Seq[Column], order: Seq[Column],
      numChunks: Int = 0): DataFrame = {
    val (pin, result) = rankedPinned(df, group, order, numChunks)
    try Iterate.cut(result)
    finally pin.unpersist(blocking = false)
  }

  /** The lazy build: returns (pinned chunk frame, result). Exposed for
    * the spec that asserts both plan branches read ONE cached
    * materialization; [[ranked]] wraps it with materialize-then-release. */
  private[graft] def rankedPinned(df: DataFrame, group: Seq[Column],
      order: Seq[Column], numChunks: Int = 0): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val chunks =
      if (numChunks > 0) numChunks
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val gNames = group.indices.map(i => s"_g$i")
    val gCols = gNames.map(col)
    val withG = df.select(
      col("*") +: group.zip(gNames).map { case (g, n) => g.as(n) }: _*)
    val ranged = withG
      .repartitionByRange(chunks, (gCols ++ order): _*)
      .withColumn("_chunk", spark_partition_id())
    // local rank within the chunk: chunk sizes are range-partitioner
    // uniform, so this window has no skewed partitions. The ordering must
    // re-state group ++ order because a chunk can straddle a group edge.
    val wChunk = Window.partitionBy(col("_chunk")).orderBy((gCols ++ order): _*)
    val local = pinned(ranged.withColumn("_lrank", row_number().over(wChunk)))
    // chunk offsets: numChunks rows — window over a singleton partition is
    // metadata-sized by construction
    val offsets = local.groupBy(col("_chunk")).agg(count(lit(1)).as("_c"))
      .withColumn("_offset",
        coalesce(sum(col("_c")).over(
          Window.orderBy(col("_chunk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_chunk"), col("_offset"))
    val global = local
      .join(broadcast(offsets), "_chunk")
      .withColumn("_grn", col("_offset") + col("_lrank"))
      .drop("_chunk", "_lrank", "_offset")
    // group metadata: |groups| rows after partial aggregation
    val groups = global.groupBy(gCols: _*)
      .agg(count(lit(1)).as("_gn"), min(col("_grn")).as("_gstart"))
    val result = global
      .join(broadcast(groups), gNames)
      .withColumn("_grank", col("_grn") - col("_gstart") + 1L)
      .drop("_grn" +: "_gstart" +: gNames: _*)
    (local, result)
  }

  /** Appends `_psum` (inclusive prefix sum of `value` over the GLOBAL
    * `order`) to `df` — the scale-out replacement for
    * `sum(value).over(Window.orderBy(order))`, which moves the entire
    * dataset to one task. Same chunking scheme as [[ranked]]: local
    * running sums within uniform range chunks, plus a chunk-total running
    * offset (numChunks rows). `order` must be total (tie-free) for a
    * deterministic result. `value` must be integral (summed as BIGINT). */
  def prefixSummed(df: DataFrame, order: Seq[Column], value: Column,
      numChunks: Int = 0): DataFrame = {
    val (pin, result) = prefixSummedPinned(df, order, value, numChunks)
    try Iterate.cut(result)
    finally pin.unpersist(blocking = false)
  }

  private[graft] def prefixSummedPinned(df: DataFrame, order: Seq[Column],
      value: Column, numChunks: Int = 0): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val chunks =
      if (numChunks > 0) numChunks
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(chunks, order: _*)
      .withColumn("_chunk", spark_partition_id())
      .withColumn("_v", value.cast("long"))
    val wChunk = Window.partitionBy(col("_chunk")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = pinned(ranged.withColumn("_lsum", sum(col("_v")).over(wChunk)))
    val offsets = local.groupBy(col("_chunk")).agg(sum(col("_v")).as("_c"))
      .withColumn("_offset",
        coalesce(sum(col("_c")).over(
          Window.orderBy(col("_chunk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_chunk"), col("_offset"))
    val result = local
      .join(broadcast(offsets), "_chunk")
      .withColumn("_psum", col("_offset") + col("_lsum"))
      .drop("_chunk", "_v", "_lsum", "_offset")
    (local, result)
  }

  /** Appends `_grank` (1-based per-group rank), `_gn` (group size), and
    * `_gps{k}` (INCLUSIVE per-group prefix sum of `values(k)`, BIGINT)
    * in ONE chunked pass — the combined [[ranked]]+[[prefixSummed]] for
    * per-group running aggregates over low-cardinality groups. Bounded
    * trailing frames follow arithmetically: the trailing-(w) sum ending
    * before row i is `_gps(i) − v_i − Pgroup(i − w − 1)`, the latter
    * fetched with one hash equi-join on (group, rank − w − 1) — see
    * Anomaly.qAnomaly, the first consumer.
    *
    * Same contract as the other entry points: `order` must be tie-free
    * within a group, `values` integral; result is cut to a leaf with the
    * chunk pin scoped to the call. */
  def groupPrefixSummed(df: DataFrame, group: Seq[Column], order: Seq[Column],
      values: Seq[Column], numChunks: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val chunks =
      if (numChunks > 0) numChunks
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val gNames = group.indices.map(i => s"_g$i")
    val gCols = gNames.map(col)
    val vNames = values.indices.map(i => s"_v$i")
    val withG = df.select(
      (col("*") +: group.zip(gNames).map { case (g, n) => g.as(n) }) ++
        values.zip(vNames).map { case (v, n) => v.cast("long").as(n) }: _*)
    val ranged = withG
      .repartitionByRange(chunks, (gCols ++ order): _*)
      .withColumn("_chunk", spark_partition_id())
    val wOrd = Window.partitionBy(col("_chunk")).orderBy((gCols ++ order): _*)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = pinned(ranged
      .withColumn("_lrank", row_number().over(wOrd))
      .select(col("*") +: vNames.zipWithIndex.map { case (v, i) =>
        sum(col(v)).over(wRun).as(s"_ls$i") }: _*))
    // per-chunk totals: count + one sum per value — numChunks rows
    val offsets = local.groupBy(col("_chunk"))
      .agg(count(lit(1)).as("_c"),
        vNames.zipWithIndex.map { case (v, i) => sum(col(v)).as(s"_cs$i") }: _*)
      .select(col("_chunk") +: (
        coalesce(sum(col("_c")).over(Window.orderBy(col("_chunk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("_offset") +:
        vNames.indices.map(i =>
          coalesce(sum(col(s"_cs$i")).over(Window.orderBy(col("_chunk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as(s"_voff$i"))): _*)
    val global = local
      .join(broadcast(offsets), "_chunk")
      .withColumn("_grn", col("_offset") + col("_lrank"))
      .select(col("*") +: vNames.indices.map(i =>
        (col(s"_voff$i") + col(s"_ls$i")).as(s"_gsum$i")): _*)
    // group metadata: size, start rank, and the GLOBAL value-prefix just
    // before the group's first row (struct-min picks the first row)
    val groups = global.groupBy(gCols: _*)
      .agg(count(lit(1)).as("_gn"),
        min(col("_grn")).as("_gstart") +:
        vNames.indices.map(i =>
          min(struct(col("_grn"), (col(s"_gsum$i") - col(s"_v$i")).as("p")))
            .getField("p").as(s"_vstart$i")): _*)
    val dropCols = Seq("_chunk", "_lrank", "_offset", "_grn", "_gstart") ++
      vNames ++ vNames.indices.flatMap(i =>
        Seq(s"_ls$i", s"_voff$i", s"_gsum$i", s"_vstart$i"))
    val result = global
      .join(broadcast(groups), gNames)
      .withColumn("_grank", col("_grn") - col("_gstart") + 1L)
      .select(col("*") +: vNames.indices.map(i =>
        (col(s"_gsum$i") - col(s"_vstart$i")).as(s"_gps$i")): _*)
      .drop(dropCols ++ gNames: _*)
    try Iterate.cut(result)
    finally local.unpersist(blocking = false)
  }

  /** Spark-exact `percent_rank` from (rank, n): (rank−1)/(n−1), 0.0 for
    * single-row groups (the builtin's convention). */
  def percentRank(rank: Column, n: Column): Column =
    when(n === 1L, 0.0)
      .otherwise((rank - 1L).cast("double") / (n - 1L).cast("double"))

  /** Spark-exact `ntile(k)` from (rank, n): the first n % k buckets take
    * one extra row — SQL-standard remainder-to-the-front sizing.
    * Divisions go through floor-of-double, exact for ranks < 2^53 (ample:
    * that is 9e15 rows per group). */
  def ntileOf(k: Int, rank: Column, n: Column): Column = {
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val small = idiv(n, lit(k))             // floor bucket size
    val large = n % k                       // buckets holding small + 1
    val cut = large * (small + 1L)          // rows covered by large buckets
    val r0 = rank - 1L
    when(small === 0L, r0 + 1L) // n < k: every row its own bucket
      .otherwise(
        when(r0 < cut, idiv(r0, small + 1L) + 1L)
          .otherwise(large + idiv(r0 - cut, small) + 1L))
  }
}
