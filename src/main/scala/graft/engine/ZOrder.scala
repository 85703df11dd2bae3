package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the layout primitive behind
  * multi-dimensional data skipping (Delta/Iceberg OPTIMIZE ZORDER BY,
  * Orenstein & Merrett's original Z-curve).
  *
  * Why it matters at 100 TB: min/max zone maps prune a scan only when the
  * file layout correlates with the filter column. Sorting by ONE column
  * destroys locality for every other column; interleaving the bits of two
  * (or more) key columns gives every participating column partial
  * locality, so selective filters on EITHER key skip most files. The
  * engine's job is (a) a cheap, codegen-friendly key and (b) a
  * repartition-by-range + sortWithinPartitions write path that turns the
  * key into physical row-group locality.
  *
  * The 21-bit spread uses the classic branch-free mask/shift ladder —
  * pure `Column` arithmetic (shiftleft/bitwiseOR/bitwiseAND), so it stays
  * inside whole-stage codegen with no UDF and no custom expression, and
  * the identical ladder is replayable in any engine with 64-bit integer
  * ops (the DuckDB oracle runs the same expressions verbatim). */
object ZOrder {

  /** Spread the low 31 bits of `c` onto the even bit positions (the
    * standard 2-D Morton mask/shift ladder, good for inputs up to 32
    * bits; 31 keeps every intermediate positive). */
  private def spread2(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0x7fffffffL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 62-bit Morton key of two non-negative 31-bit columns: `a` on even
    * bits, `b` on odd. Monotone in each argument when the other is fixed —
    * the property zone-map pruning relies on. */
  def morton2(a: Column, b: Column): Column =
    spread2(a).bitwiseOR(shiftleft(spread2(b), 1))

  /** Write-time ZORDER BY layout (what Delta/Iceberg OPTIMIZE does):
    * scale both key columns to a common 16-bit width by min/max (raw
    * interleaving degenerates to a single-column sort when the domains
    * have very different bit widths — the narrow column's bits all land
    * below the wide column's), interleave, then range-partition and sort
    * by the key so parquet row-group zone maps get tight min/max on BOTH
    * columns. The min/max pass is one cheap aggregate at write time —
    * the same pre-pass every production ZORDER implementation runs. */
  def zorderLayout(df: DataFrame, a: String, b: String, files: Int): DataFrame = {
    val r = df.agg(min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).head()
    def scale16(c: Column, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else floor((c.cast("long") - lit(lo)).cast("double") * 65535.0 / (hi - lo).toDouble)
        .cast("long")
    val zkey = morton2(
      scale16(col(a), r.getLong(0), r.getLong(1)),
      scale16(col(b), r.getLong(2), r.getLong(3)))
    df.withColumn("_zkey", zkey)
      .repartitionByRange(files, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
  }

  /** q_zorder: lineitem clustered by morton2(l_partkey, l_suppkey) — the
    * key itself plus the cluster-local ordering, top-1000 with a full
    * tiebreak (lineitem's unique key needs all four columns, TESTDATA
    * note). At scale the same key feeds `repartitionByRange(zkey)` +
    * `sortWithinPartitions(zkey)` before the write (spec'd with a real
    * file-skipping measurement in ZOrderSpec); the query surfaces the key
    * algebra to the DuckDB differential. */
  def qZorder(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        morton2(col("l_partkey"), col("l_suppkey")).as("zkey"))
      .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_suppkey"), col("l_partkey"))
      .limit(1000)
  }

  /** The identical mask/shift ladder in SQL (DuckDB `<<` / `&` / `|` on
    * BIGINT), applied to both columns. */
  val qZorderSql: String =
    """WITH s AS (
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |    l_partkey, l_suppkey,
      |    l_partkey & 2147483647 AS a0, l_suppkey & 2147483647 AS b0
      |  FROM lineitem
      |), t AS (
      |  SELECT *,
      |    (a0 | (a0 << 16)) & 281470681808895 AS a1,
      |    (b0 | (b0 << 16)) & 281470681808895 AS b1
      |  FROM s
      |), u AS (
      |  SELECT *,
      |    (a1 | (a1 << 8)) & 71777214294589695 AS a2,
      |    (b1 | (b1 << 8)) & 71777214294589695 AS b2
      |  FROM t
      |), v AS (
      |  SELECT *,
      |    (a2 | (a2 << 4)) & 1085102592571150095 AS a3,
      |    (b2 | (b2 << 4)) & 1085102592571150095 AS b3
      |  FROM u
      |), w AS (
      |  SELECT *,
      |    (a3 | (a3 << 2)) & 3689348814741910323 AS a4,
      |    (b3 | (b3 << 2)) & 3689348814741910323 AS b4
      |  FROM v
      |), z AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |    ((a4 | (a4 << 1)) & 6148914691236517205)
      |    | ((((b4 | (b4 << 1)) & 6148914691236517205)) << 1) AS zkey
      |  FROM w
      |)
      |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, zkey
      |FROM z
      |ORDER BY zkey, l_orderkey, l_linenumber, l_suppkey, l_partkey
      |LIMIT 1000""".stripMargin
}
