package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding compression for the similarity stack: int8 scalar
  * quantization (per-vector min/max affine codes) — the standard first
  * step when a 100 TB embedding corpus must fit an ANN serving tier
  * (4× smaller than float32, dequantization error ≤ (hi−lo)/510).
  *
  * Quantization is pure affine double arithmetic with a fixed
  * parenthesization (see [[QuantizeU8]]), so unlike the float *training*
  * paths (q_sim_ivf's k-means), the codes are cross-engine deterministic
  * and the whole operator is DuckDB-oracle-checked.
  */
object Quantize {

  /** q_quantize_embed: per-vector int8 codes + the (lo, hi) dequant range.
    * One codegen'd pass per vector (QuantizeU8 — min/max fold and the
    * quantize loop run once; a HOF-lambda formulation would re-evaluate
    * array_min per element after CollapseProject inlines it). Narrow,
    * shuffle-free; codes render as a comma string so the differential
    * check pins every component exactly. */
  def qQuantizeEmbed(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VectorExprs.quantizeU8(col("embedding")).as("qz"))
      .select(col("vec_id"),
        col("qz.lo").as("lo"),
        col("qz.hi").as("hi"),
        array_join(col("qz.q").cast("array<string>"), ",").as("q_str"))

  /** The quantizer replayed in DuckDB: identical expression tree
    * (floor(((x − lo) · 255.0) / (hi − lo) + 0.5)) over the float-exact
    * doubles — every op IEEE-correctly-rounded in both engines, so the
    * codes match bit-for-bit. floor-then-cast (not a bare CAST: DuckDB
    * rounds double→int, Spark truncates — floor makes the value integral
    * first so both casts are exact). */
  val qQuantizeEmbedSql: String =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |m AS (
      |  SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM v)
      |SELECT vec_id, lo, hi,
      |  array_to_string(
      |    CASE WHEN hi = lo THEN [0 for x in v]
      |         ELSE [CAST(floor(((x - lo) * 255.0) / (hi - lo) + 0.5) AS INT)
      |               for x in v]
      |    END, ',') AS q_str
      |FROM m ORDER BY vec_id""".stripMargin
}
