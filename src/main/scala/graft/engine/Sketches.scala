package graft.engine

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the VERIFIABLE
  * counterpart to `approx_count_distinct`'s HLL (q_agg_approx, which is
  * engine-only by nature: HLL register layouts are implementation-defined).
  *
  * The sketch keeps the k smallest DISTINCT values of a 63-bit hash of the
  * key; with U = kth-min / 2⁶³ the estimator (k−1)/U is the classic KMV
  * distinct estimate (Bar-Yossef et al., RANDOM '02). Because the hash is
  * the deterministic xorshift mix q_sample_stratified already replays in
  * DuckDB HUGEINT, and "k smallest distinct" is pure integer order, the
  * whole sketch — not just its final estimate — is cross-engine
  * deterministic and DuckDB-oracle-checked. Only the final division is
  * floating point, and both engines evaluate the identical correctly-rounded
  * double expression.
  *
  * 100 TB shape: a bounded O(k)-longs buffer per group; partial buffers
  * merge map-side (merge of two sorted distinct arrays, truncated at k), so
  * the shuffle carries ≤ k longs per group per map task — the same contract
  * as HLL, with none of `countDistinct`'s exact-set state. The exact
  * distinct count rides alongside in the same query as the accuracy
  * baseline (Spark plans it as an Expand — fine at 5 groups; at scale the
  * sketch column alone is the product).
  */
object Sketches {

  /** Sorted-ascending distinct hashes, at most k. Product-encodable. */
  final case class KmvBuf(hashes: Array[Long])

  final class KmvAggregator(k: Int)
      extends Aggregator[Long, KmvBuf, Array[Long]] {

    override def zero: KmvBuf = KmvBuf(Array.empty)

    /** Steady-state fast path: once the buffer is full, almost every row's
      * hash exceeds the kth-min and is a no-op — return the buffer
      * untouched (no allocation, one comparison). A binary-search member
      * check skips duplicates the same way; only genuinely new
      * below-kth-min hashes pay the O(k) merge. */
    override def reduce(b: KmvBuf, in: Long): KmvBuf = {
      val h = b.hashes
      if (h.length == k && in >= h(k - 1)) b
      else if (java.util.Arrays.binarySearch(h, in) >= 0) b
      else merge(b, KmvBuf(Array(in)))
    }

    /** Merge two sorted distinct arrays, dropping duplicates, cap k. */
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      val n = Math.min(k, a.hashes.length + b.hashes.length)
      val out = new Array[Long](n)
      var i = 0; var j = 0; var o = 0
      while (o < n && (i < a.hashes.length || j < b.hashes.length)) {
        val takeA = j >= b.hashes.length ||
          (i < a.hashes.length && a.hashes(i) <= b.hashes(j))
        val v = if (takeA) { val x = a.hashes(i); i += 1; x }
                else { val x = b.hashes(j); j += 1; x }
        if (takeA && j < b.hashes.length && b.hashes(j) == v) j += 1 // dedup across
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      KmvBuf(if (o == n) out else java.util.Arrays.copyOf(out, o))
    }

    override def finish(b: KmvBuf): Array[Long] = b.hashes

    override def bufferEncoder: Encoder[KmvBuf] = ExpressionEncoder[KmvBuf]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Sketch size: k = 64 → expected relative error ~1/√(k−2) ≈ 12.7%. */
  private val K = 64

  /** (k−1)·2⁶³ as an exact double (63 = 6 mantissa bits, exact). */
  private val EstNumerator: Double = (K - 1).toDouble * 9223372036854775808.0

  /** q_agg_kmv: distinct users per event type — exact count + KMV sketch
    * side by side. uh = xorshift_mix(user_id) >>> 1 ∈ [0, 2⁶³): signed and
    * unsigned order agree, and DuckDB replays it as HUGEINT // 2. Estimate
    * = (k−1)·2⁶³ / kth-min when the buffer filled, else the buffer size
    * (which IS the exact distinct-hash count below k). */
  def qAggKmv(spark: SparkSession, sfDir: String): DataFrame = {
    val kmv = udaf(new KmvAggregator(K))
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        col("user_id"),
        shiftrightunsigned(NumExprs.xorshiftMix(col("user_id")), 1).as("uh"))
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_exact"),
        kmv(col("uh")).as("kmin"))
      .select(col("event_type"), col("n_exact"),
        get(col("kmin"), lit(K - 1)).as("kth_hash"),
        when(size(col("kmin")) < K, size(col("kmin")).cast("double"))
          .otherwise(lit(EstNumerator) / get(col("kmin"), lit(K - 1)).cast("double"))
          .as("est_distinct"))
      .orderBy(col("event_type"))
  }

  /** The sketch replayed end-to-end in DuckDB: same xorshift chain as the
    * q_sample_stratified oracle (HUGEINT mod 2⁶⁴), uh = x // 2, k smallest
    * distinct via ROW_NUMBER over DISTINCT hashes, identical estimate
    * expression — (63.0 · 2⁶³) is exact in double on both sides. */
  val qAggKmvSql: String =
    s"""WITH
       |s0 AS (SELECT event_type, user_id,
       |  xor(CAST(user_id AS HUGEINT), 11400714819323198485::HUGEINT) AS x
       |  FROM events),
       |s1 AS (SELECT event_type, user_id,
       |  xor(x, (x * 8192) % 18446744073709551616::HUGEINT) AS x FROM s0),
       |s2 AS (SELECT event_type, user_id, xor(x, x // 128) AS x FROM s1),
       |s3 AS (SELECT event_type, user_id,
       |  xor(x, (x * 131072) % 18446744073709551616::HUGEINT) AS x FROM s2),
       |s4 AS (SELECT event_type, user_id,
       |  xor(x, (x * 8192) % 18446744073709551616::HUGEINT) AS x FROM s3),
       |s5 AS (SELECT event_type, user_id, xor(x, x // 128) AS x FROM s4),
       |s6 AS (SELECT event_type, user_id,
       |  xor(x, (x * 131072) % 18446744073709551616::HUGEINT) AS x FROM s5),
       |k AS (SELECT event_type, user_id, x // 2 AS uh FROM s6),
       |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
       |       FROM k GROUP BY event_type),
       |d AS (SELECT DISTINCT event_type, uh FROM k),
       |r AS (SELECT event_type, uh,
       |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY uh) AS rn,
       |        COUNT(*) OVER (PARTITION BY event_type) AS nd
       |      FROM d),
       |g AS (SELECT event_type, MAX(nd) AS nd,
       |        MAX(CASE WHEN rn = $K THEN uh END) AS kth
       |      FROM r GROUP BY event_type)
       |SELECT g.event_type, ex.n_exact,
       |  CAST(g.kth AS BIGINT) AS kth_hash,
       |  CASE WHEN g.nd < $K THEN CAST(g.nd AS DOUBLE)
       |       ELSE (63.0 * 9223372036854775808.0) /
       |            CAST(CAST(g.kth AS BIGINT) AS DOUBLE) END AS est_distinct
       |FROM g JOIN ex ON g.event_type = ex.event_type
       |ORDER BY g.event_type""".stripMargin
}
