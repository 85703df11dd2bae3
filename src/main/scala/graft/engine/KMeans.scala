package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mini k-means for IVF coarse quantization, in pure DataFrame ops — the
  * trainer behind `q_sim_ivf`'s cells.
  *
  * Every step is shuffle-bounded and driver-free:
  *  - assignment: broadcast the k centroids, argmax cosine via max_by on
  *    narrow (vec_id, cid, sim) rows — the corpus never shuffles;
  *  - update: posexplode embeddings → avg per (cid, dim) → re-assemble the
  *    centroid arrays with sort_array(collect_list(struct(dim, avg))).
  *    k·dim groups total, independent of corpus size.
  *
  * At 100 TB the assignment pass is the only corpus-wide stage and it's a
  * narrow map; centroid state stays a k-row DataFrame end to end. */
object KMeans {

  /** Assign each vector to its best centroid (cosine). */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.join(broadcast(centroids))
      .select(col("vec_id"), col("cid"),
        LlmOps.cosine(col("ce"), col("embedding")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("cid"),
        max(col("sim")).as("sim"))

  /** One Lloyd update: mean of assigned vectors per centroid. Cells that
    * lost all members keep their previous centroid. */
  def update(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = assign(vectors, centroids)
      .join(vectors, "vec_id")
    val dims = assigned
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
    // each Lloyd round scans the corpus twice (assign + re-attach); cache
    // it for the duration of training, release after the final centroids
    // are a materialized leaf
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
