package graft.engine

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative DataFrame algorithms.
  *
  * A loop that feeds a DataFrame back into itself (connected components,
  * Lloyd rounds) grows its logical plan by one join+agg layer per
  * iteration even when every step is persisted: `persist` caches the
  * result but keeps the full plan, so (a) Catalyst re-analyzes an
  * O(iterations)-sized tree every round — driver time quadratic in
  * rounds — and (b) losing one cached partition recomputes the entire
  * history. The standard fix is to cut the plan at each round's
  * boundary, making the iteration state a materialized leaf.
  *
  * `cut` uses the reliable `checkpoint` (HDFS-backed, survives executor
  * loss — what a 1000-executor run wants; reference analog: the
  * connector's offset persistence after each completed batch,
  * ChargeOverSourceTask.java:267-291) when the session has a checkpoint
  * dir configured, else the eager `localCheckpoint` (executor-local
  * blocks: right default for local[n] and for state that is cheap to
  * rebuild from the previous round). Both materialize eagerly, so the
  * caller's convergence `count` reads from the cached result.
  */
object Iterate {
  /** Materialize `df` and return an equivalent frame whose plan is a
    * single leaf (LogicalRDD / scan-of-checkpoint). */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else
      df.localCheckpoint(eager = true)
}
