package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset assembly for training pipelines: deterministic split
  * assignment and weighted source mixing — the two operations that turn
  * a curated corpus into an actual training set.
  *
  * Both are keyed by the same seeded xorshift64 mix (NumExprs.XorShiftMix,
  * codegen'd; DuckDB HUGEINT replay): a pure function of the row key, so
  * assignment is stable across runs, machines and engines — re-running
  * the pipeline after adding documents never reshuffles existing rows
  * between train and validation (the property that keeps eval sets
  * uncontaminated as the corpus grows), and the oracle can replay the
  * exact same choice.
  */
object Mixture {

  private val Buckets = 1L << 20

  /** q_split_assign: hash-partition every document into train/val/test at
    * 80/10/10 by mixed doc_id — a disjoint, exhaustive, stable split.
    * Output is the per-(source, split) contingency: counts and character
    * mass, which is also the drift report a pipeline monitors (a source
    * whose split ratio wanders from 80/10/10 signals key skew).
    *
    * One narrow codegen'd projection + one aggregation shuffle; nothing
    * scans twice. At 100 TB the split column would be written back and
    * the aggregate is the audit. */
  def qSplitAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = NumExprs.xorshiftMix(col("doc_id"))
      .bitwiseAND(lit(Buckets - 1L))
    val split = when(bucket < (Buckets * 8L / 10L), "train")
      .when(bucket < (Buckets * 9L / 10L), "val")
      .otherwise("test")
    Tables.documents(spark, sfDir)
      .withColumn("split", split)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"), col("split"))
  }

  /** The same two xorshift rounds in HUGEINT mod-2⁶⁴ (NumExprs scaladoc):
    * shl k = ·2ᵏ mod 2⁶⁴, unsigned shr k = ÷2ᵏ. */
  private def ladderSql(keyExpr: String, keep: String, table: String): String =
    s"""s0 AS (SELECT $keep,
       |  xor(CAST($keyExpr AS HUGEINT), 11400714819323198485::HUGEINT) AS x
       |  FROM $table),
       |s1 AS (SELECT $keep, xor(x, (x * 8192) % 18446744073709551616::HUGEINT) AS x FROM s0),
       |s2 AS (SELECT $keep, xor(x, x // 128) AS x FROM s1),
       |s3 AS (SELECT $keep, xor(x, (x * 131072) % 18446744073709551616::HUGEINT) AS x FROM s2),
       |s4 AS (SELECT $keep, xor(x, (x * 8192) % 18446744073709551616::HUGEINT) AS x FROM s3),
       |s5 AS (SELECT $keep, xor(x, x // 128) AS x FROM s4),
       |s6 AS (SELECT $keep, xor(x, (x * 131072) % 18446744073709551616::HUGEINT) AS x FROM s5)""".stripMargin

  val qSplitAssignSql: String =
    s"""WITH ${ladderSql("doc_id", "source, n_chars", "documents")},
       |k AS (SELECT source, n_chars, x % 1048576 AS bucket FROM s6)
       |SELECT source,
       |  CASE WHEN bucket < 838860 THEN 'train'
       |       WHEN bucket < 943718 THEN 'val'
       |       ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM k GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  /** Stratified deterministic sampling: per stratum, keep exactly
    * ceil(n·num/den) rows — the prefix of the seeded-hash order. Same
    * determinism as the split: the order is a pure function of the row
    * keys, so the same corpus always yields the same sample (across runs,
    * machines and engines), and growing a stratum only perturbs membership
    * at the prefix frontier — interior order never reshuffles. Returns the
    * sampled ROWS (the training-pipeline op: downsample each source to a
    * recipe fraction); q_sample_exact
    * audits it.
    *
    * Scale: one window shuffle on the stratum (rank + stratum count share
    * the exchange); no second scan, no driver state. Skewed strata ride
    * the same chunked-window escape hatch as any other window op. */
  def sampleStratified(docs: DataFrame, keyCol: String, strataCol: String,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den >= num, s"fraction $num/$den out of (0,1]")
    val wOrd = Window.partitionBy(col(strataCol))
      .orderBy(col("graft_mix"), col(keyCol))
    val wAll = Window.partitionBy(col(strataCol))
    docs
      .withColumn("graft_mix", NumExprs.xorshiftMix(col(keyCol)))
      .withColumn("graft_rn", row_number().over(wOrd))
      .withColumn("graft_n", count(lit(1)).over(wAll))
      .filter(col("graft_rn") <= expr(s"(graft_n * $num + ${den - 1}) div $den"))
      .drop("graft_mix", "graft_rn", "graft_n")
  }

  /** q_sample_exact: exact 10% per source (ceil), audited per source
    * as (total, sampled count, sampled character mass, sampled-id sum —
    * a membership checksum: equal counts with a different SET of chosen
    * documents cannot hash-match). */
  def qSampleExact(spark: SparkSession, sfDir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("source")).orderBy(col("mix"), col("doc_id"))
    val wAll = Window.partitionBy(col("source"))
    Tables.documents(spark, sfDir)
      .withColumn("mix", NumExprs.xorshiftMix(col("doc_id")))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n_total", count(lit(1)).over(wAll))
      .filter(col("rn") <= expr("(n_total + 9) div 10"))
      .groupBy(col("source"))
      .agg(max(col("n_total")).as("n_total"),
        count(lit(1)).as("n_sampled"),
        sum(col("n_chars")).as("chars_sampled"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("source"))
  }

  /** Same ladder, same signed reinterpret before ordering as qMixtureSql. */
  val qSampleExactSql: String =
    s"""WITH ${ladderSql("doc_id", "doc_id, source, n_chars", "documents")},
       |sx AS (SELECT doc_id, source, n_chars,
       |  CAST(CASE WHEN x >= 9223372036854775808::HUGEINT
       |       THEN x - 18446744073709551616::HUGEINT ELSE x END AS BIGINT) AS xs
       |  FROM s6),
       |r AS (SELECT doc_id, source, n_chars,
       |  row_number() OVER (PARTITION BY source ORDER BY xs, doc_id) AS rn,
       |  COUNT(*) OVER (PARTITION BY source) AS n_total
       |  FROM sx)
       |SELECT source, MAX(n_total) AS n_total, COUNT(*) AS n_sampled,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars_sampled,
       |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
       |FROM r WHERE rn <= (n_total + 9) // 10
       |GROUP BY source ORDER BY source""".stripMargin

  /** q_mixture: weighted source mixing under a character budget — every
    * source contributes documents in its deterministic hash order until
    * its budget (4000 chars for even-numbered sources, 2000 for odd — the
    * up-/down-weighting a data recipe assigns) is EXCEEDED; the crossing
    * document is included, so every source with data contributes at least
    * one document and selection is a pure prefix of the hash order.
    *
    * Scale posture: ONE window shuffle on source (running character sum
    * in hash order), then the filter and the contingency aggregate reuse
    * the same partitioning. The hash order is the load-bearing part: a
    * `LIMIT`-per-source formulation would need a global sort per source,
    * and a random() one is irreproducible — the mixed key gives an
    * arbitrary-but-fixed order both engines replay exactly. */
  def qMixture(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = when(
      regexp_extract(col("source"), "(\\d+)$", 1).cast("long") % 2 === 0,
      4000L).otherwise(2000L)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("mix"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .withColumn("mix", NumExprs.xorshiftMix(col("doc_id")))
      .withColumn("cum_chars", sum(col("n_chars")).over(w))
      .filter(col("cum_chars") - col("n_chars") < budget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n_chars")).as("chars_selected"))
      .orderBy(col("source"))
  }

  /** The ladder's x is HUGEINT-unsigned; Spark orders the SIGNED 64-bit
    * value — reinterpret before ordering or the two engines walk each
    * source's documents in different orders. */
  val qMixtureSql: String =
    s"""WITH ${ladderSql("doc_id", "doc_id, source, n_chars", "documents")},
       |sx AS (SELECT doc_id, source, n_chars,
       |  CAST(CASE WHEN x >= 9223372036854775808::HUGEINT
       |       THEN x - 18446744073709551616::HUGEINT ELSE x END AS BIGINT) AS xs
       |  FROM s6),
       |c AS (SELECT source, n_chars,
       |  SUM(n_chars) OVER (PARTITION BY source ORDER BY xs, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_chars,
       |  CASE WHEN CAST(regexp_extract(source, '(\\d+)$$', 1) AS BIGINT) % 2 = 0
       |       THEN 4000 ELSE 2000 END AS budget
       |  FROM sx)
       |SELECT source, COUNT(*) AS n_selected,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars_selected
       |FROM c WHERE cum_chars - n_chars < budget
       |GROUP BY source ORDER BY source""".stripMargin
}
