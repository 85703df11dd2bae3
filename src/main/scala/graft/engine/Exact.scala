package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL (Verify.scala). Double aggregation is order-dependent, and
  * Spark/DuckDB shuffle-reduce in different orders — so any `SUM(double)`
  * would drift in the last ulps and flip the hash. The fix: cast each row to
  * an exact decimal FIRST (the testdata's numerics are 2-decimal, see
  * FIXTURES.md), sum the decimals (exact, associative, order-independent in
  * both engines), and cast the final value back to double — correctly
  * rounded on BOTH sides (see the VARCHAR routing note on the SQL
  * spellings below).
  *
  * Timestamps: testdata `events.ts` is parquet timestamp[ns]; Spark reads µs,
  * DuckDB reads ns — formatting/precision differences would break hashes, so
  * outputs carry `epoch micros` as BIGINT (`unix_micros` ↔ DuckDB
  * `epoch_us`). All values are µs-granular so this is lossless.
  *
  * At scale these helpers cost nothing: decimal sums stay inside whole-stage
  * codegen and map-side partial aggregation applies as usual.
  */
object Exact {
  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum at scale 6 (for per-row products like price*(1-disc)). */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(27, 6))).cast("double")

  /** Deterministic average: exact decimal sum divided by count in double
    * arithmetic (both engines do the identical final division). */
  def davg2(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))).cast("double") / count(c)).as("avg")

  /** DuckDB-side spellings, kept adjacent so the pair stays in sync.
    *
    * The decimal→double conversion is routed through VARCHAR on the
    * DuckDB side: DuckDB's direct decimal→double cast divides the backing
    * integer by 10^scale IN DOUBLE (two roundings), while Spark's
    * Decimal.toDouble correctly rounds the exact value once
    * (BigDecimal.doubleValue). The difference only surfaces once the sum
    * carries ≥17 significant digits — the sf1 differential caught
    * q_agg_hash's sum_charge (~2.8e10 at scale 6) off by one ulp.
    * VARCHAR renders the exact decimal digits and DuckDB's string→double
    * parse is correctly rounded, matching Spark bit-for-bit at any scale. */
  def sqlSum2(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
  def sqlSum6(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)"
  def sqlAvg2(expr: String): String =
    s"${sqlSum2(expr)} / COUNT($expr)"
}
