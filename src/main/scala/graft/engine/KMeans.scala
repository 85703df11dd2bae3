package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mini k-means for IVF coarse quantization, in pure DataFrame ops — the
  * trainer behind `q_sim_ivf`'s cells.
  *
  * Every step is shuffle-bounded; the corpus never shuffles:
  *  - assignment: one codegen'd NearestCentroidCosF pass — the k-loop
  *    runs inside the expression against the k-bounded centroid
  *    literals, so there is NO broadcast join (which materialized n·k
  *    rows each copying both 64-float arrays), NO argmax aggregation,
  *    and NO corpus-sized join to re-attach the embedding;
  *  - update: posexplode embeddings → avg per (cid, dim) → re-assemble
  *    the centroid arrays with sort_array(collect_list(struct(dim, avg))).
  *    k·dim groups total, independent of corpus size.
  *
  * Centroid state lives on the driver between rounds as k (cid, vector)
  * tuples — the identical k-row collect a broadcast build performs, i.e.
  * planning metadata like IvfIndex.probedCells, never corpus-sized. At
  * 100 TB the assignment pass is the only corpus-wide stage and it's a
  * narrow map. */
object KMeans {

  /** k-bounded centroid collect: the same driver hop broadcast(cents)
    * paid, reused as expression literals. */
  private def collectCents(centroids: DataFrame): (Seq[Int], Seq[Seq[Float]]) = {
    val rows = centroids.select(col("cid"), col("ce")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    (rows.map(_._1).toSeq, rows.map(_._2).toSeq)
  }

  /** Assign each vector to its best centroid (cosine). Output
    * (vec_id, cid, sim) — value-identical to the former
    * broadcast-join + max_by(cid, struct(sim, -cid)) formulation (the
    * expression replicates Spark's double ordering and the lowest-cid
    * tiebreak). */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val (cids, cents) = collectCents(centroids)
    vectors
      .withColumn("_nc", VectorExprs.nearestCentroidCos(col("embedding"), cids, cents))
      .select(col("vec_id"), col("_nc.cid").as("cid"), col("_nc.sim").as("sim"))
  }

  /** `vectors` plus its best-centroid `cid` column — every input column
    * (embedding included) rides along, so consumers that need the
    * payload next to the cell id pay NO re-attach join. */
  def withCell(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val (cids, cents) = collectCents(centroids)
    vectors.withColumn("cid",
      VectorExprs.nearestCentroidCos(col("embedding"), cids, cents).getField("cid"))
  }

  /** One Lloyd update: mean of assigned vectors per centroid. Cells that
    * lost all members keep their previous centroid. The assignment rides
    * the same scan as the posexplode — no join re-attaches the
    * embedding. */
  def update(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val (cids, cents) = collectCents(centroids)
    val dims = vectors
      .select(VectorExprs.nearestCentroidCos(col("embedding"), cids, cents)
        .getField("cid").as("cid"), col("embedding"))
      .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cid"), col("dim"))
      .agg(avg(col("v")).as("m"))
    val fresh = dims.groupBy(col("cid"))
      .agg(transform(
        sort_array(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m").cast("float")).as("ce"))
    // keep previous centroid for empty cells
    centroids.select(col("cid"), col("ce").as("old_ce"))
      .join(fresh, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("ce"), col("old_ce")).as("ce"))
  }

  /** Train k centroids: deterministic init (first k by vec_id), `iters`
    * Lloyd rounds. Each round's k-row centroid frame is cut to a
    * materialized leaf (Iterate.cut) — otherwise the plan nests one full
    * assignment+update pipeline per round and every downstream use
    * re-optimizes (and on cache loss re-runs) the whole training history. */
  def train(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    // each Lloyd round scans the corpus once (assignment and posexplode
    // share the scan); cache it for the duration of training, release
    // after the final centroids are a materialized leaf
    val v = vectors.persist()
    try {
      // init = first k by vec_id. orderBy.limit(k) is a distributed
      // TakeOrdered; numbering the K-ROW result uses a single-group
      // collect_list + posexplode instead of a window — a bare
      // Window.orderBy would single-partition (and warn on) its input
      var cents = Iterate.cut(v
        .orderBy(col("vec_id")).limit(k)
        .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("cs"))
        .select(posexplode(col("cs")).as(Seq("cid", "s")))
        .select(col("cid").cast("int").as("cid"), col("s.embedding").as("ce")))
      for (_ <- 0 until iters) cents = Iterate.cut(update(v, cents))
      cents
    } finally v.unpersist(blocking = false)
  }

  /** Mean best-centroid similarity — rises (or holds) per Lloyd round;
    * the spec asserts training actually improves the quantization. */
  def meanBestSim(vectors: DataFrame, centroids: DataFrame): Double =
    assign(vectors, centroids).agg(avg(col("sim"))).collect()(0).getDouble(0)
}
