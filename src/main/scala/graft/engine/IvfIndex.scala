package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF index: build once, probe many.
  *
  * `q_sim_ivf` trains + probes in one plan, which is right for a
  * self-contained query but wrong as an architecture at 100 TB — there
  * the index is an artifact: the coarse quantizer trains once, every
  * vector is assigned to a cell, and the corpus lands on disk
  * PARTITIONED BY CELL. A probe then touches only `nprobe` directories
  * out of `k` — the dominant cost term drops from |corpus| to
  * |corpus|·nprobe/k at the SCAN, before any compute happens.
  *
  * The probe collects the union of probed cell ids to the driver before
  * reading the corpus. That set is bounded by k (16 here; a few thousand
  * at scale) — it is planning metadata, not data, exactly like the
  * paginated source pruning pages at planning time — and turns into a
  * static partition filter on the cell-partitioned parquet
  * (`PartitionFilters: cid IN (...)`), so unprobed cells are never read.
  *
  * Layout under `dir`:
  *   centroids/   k rows (cid, ce)
  *   cells/       (vec_id, embedding) partitioned by cid
  */
object IvfIndex {

  /** Train the coarse quantizer and write the cell-partitioned corpus. */
  def build(emb: DataFrame, dir: String, k: Int = 16, iters: Int = 2): Unit = {
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val cents = KMeans.train(vecs, k, iters)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    KMeans.withCell(vecs, cents)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/cells")
  }

  /** Per-query probe list: the `nprobe` nearest cells. (qid, qe, cid). */
  private def probeList(spark: SparkSession, dir: String, queries: DataFrame,
      nprobe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qsim").desc, col("cid").asc)
    queries.join(broadcast(cents))
      .select(col("qid"), col("qe"), col("cid"),
        VectorExprs.vcosine(col("ce"), col("qe")).as("qsim"))
      .withColumn("prn", row_number().over(wProbe)).filter(col("prn") <= nprobe)
      .select(col("qid"), col("qe"), col("cid"))
  }

  /** The union of probed cell ids — driver-side planning metadata,
    * bounded by k. */
  def probedCells(spark: SparkSession, dir: String, queries: DataFrame,
      nprobe: Int = 2): Seq[Int] =
    probeList(spark, dir, queries, nprobe)
      .select(col("cid")).distinct().collect().map(_.getInt(0)).toSeq

  /** Top-k cosine neighbors for each query vector, scanning only the
    * probed cells. `queries`: (qid, qe). */
  def probe(spark: SparkSession, dir: String, queries: DataFrame,
      nprobe: Int = 2, topk: Int = 3): DataFrame = {
    val probes = probeList(spark, dir, queries, nprobe)
    val cids = probedCells(spark, dir, queries, nprobe)
    val cells = spark.read.parquet(s"$dir/cells")
      .filter(col("cid").isin(cids: _*))
    val wRank = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    probes.join(cells, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorExprs.vcosine(col("qe"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= topk)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy(col("qid"), col("rank"))
  }
}
