package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigated (salted) shuffle joins — the standard remedy when a
  * shuffle join's key distribution concentrates on a few hot keys and one
  * reducer partition runs 100× longer than the rest.
  *
  * AQE's skew-join split handles SORT-MERGE skew automatically, but only
  * at shuffle-block granularity and only when statistics detect it; a
  * salted join is the deterministic, planner-independent form — the build
  * side replicates S ways, the probe side scatters each hot key across S
  * sub-keys, and the hot key's work spreads over S reducers BY
  * CONSTRUCTION. The algebra: for any salt assignment s(r) ∈ [0,S) of
  * probe rows,
  *
  *   probe ⋈_k build  ==  (probe × s) ⋈_{k, s} (build × [0,S))
  *
  * because every probe row meets exactly the one build replica carrying
  * its salt. Correctness is INDEPENDENT of the salt function — only the
  * balance depends on it — which is what makes the rewrite safe to apply
  * mechanically and exactly what the oracle checks (the salted result must
  * hash-equal the plain join's).
  *
  * Reference anchor: the reference joins each fetched page against its
  * parent entity in the denormalizing expand (SURVEY §2a R6); at its
  * single-node scale skew never bites, but the same logical join at 100 TB
  * has to survive a power-law key distribution.
  */
object Skew {

  /** `fact ⋈ dim` on `key`, dim replicated `salts` ways, fact salted by a
    * deterministic mix of `saltFrom` (any column; uniqueness not required —
    * only balance). Result == the unsalted inner join, column-for-column.
    *
    * At scale: one shuffle of the fact side on (key, salt) — the same
    * bytes a plain shuffle join moves — and `salts` × |dim| build rows.
    * The shuffle-hash hint keeps the build side a hash map (no sort); for
    * a dim too large to replicate-and-hash, salt only the detected-hot
    * keys instead (partial salting — same algebra, keyed by a hot-key
    * broadcast set). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      saltFrom: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // xorshift-mixed salt: sequential ids land on different salts, so even
    // an ordered probe side spreads; pmod keeps it in [0, salts)
    val salted = fact.withColumn("_salt",
      pmod(NumExprs.xorshiftMix(saltFrom), lit(salts.toLong)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    // hint the REPLICATED side: shuffle-hash builds the hinted relation's
    // hash map, and the dim×salts side is the one that must stay the build
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "_salt"))
      .drop("_salt")
  }

  /** q_skew_join: lineitem (fact) ⋈ supplier (dim) on l_suppkey through
    * the salted rewrite, then an exact per-nation rollup. The oracle is
    * the PLAIN join + rollup — the query passes only if salting is
    * invisible in the result, which is the operator's entire contract.
    * Deliberately pinned to the non-broadcast path (PlanSpec): broadcast
    * is the first resort for a small dim, but the salted shuffle is the
    * posture that survives a build side too big to broadcast. */
  def qSkewJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    saltedJoin(li, supp, "l_suppkey", salts = 8,
      saltFrom = col("l_orderkey") * lit(8L) + col("l_linenumber"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        Exact.dsum2(col("l_quantity")).as("sum_qty"),
        Exact.dsum2(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("s_nationkey"))
  }

  /** The plain (unsalted) join — bit-identical output is the contract. */
  val qSkewJoinSql: String =
    s"""SELECT s_nationkey,
       |  COUNT(*) AS n_items,
       |  ${Exact.sqlSum2("l_quantity")} AS sum_qty,
       |  ${Exact.sqlSum2("l_extendedprice")} AS sum_price
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_nationkey
       |ORDER BY s_nationkey""".stripMargin
}
