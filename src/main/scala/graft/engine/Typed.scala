package graft.engine

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed Dataset surface (SURVEY.md §7: `Dataset[T]` where compile-time
  * field checks help). The showcase keeps ORACLE-IDENTICAL semantics: the
  * per-row product is rounded to scale 6 with HALF_UP — exactly what
  * Spark's double→decimal(27,6) cast does — then summed exactly in
  * BigDecimal, so the typed path, the DataFrame path (Exact.dsum6) and the
  * DuckDB oracle all produce the same double.
  *
  * Scale note, stated honestly: `groupByKey.mapGroups` shuffles whole rows
  * (no partial aggregation) — the declarative `groupBy().agg(sum(...))`
  * in q_agg_hash is the 100 TB path. Typed grouping earns its keep where
  * per-group logic genuinely can't be expressed as Columns; this query
  * exists to pin that the two paths agree bit-for-bit.
  */
object Typed {

  case class LineRev(l_returnflag: String, l_extendedprice: Double, l_discount: Double)

  /** q_typed_revenue: revenue per returnflag via the typed API. Restricted
    * to a 1-in-10 orderkey sample: groupByKey ships whole rows into
    * |groups| tasks, so the demonstration deliberately bounds its input
    * (the unrestricted aggregate is q_agg_hash's job). */
  def qTypedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter(pmod(col("l_orderkey"), lit(10)) === 0)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_discount"))
      .as[LineRev]
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var sum = JBigDecimal.ZERO
        var n = 0L
        rows.foreach { r =>
          val product = r.l_extendedprice * (1.0 - r.l_discount) // same double op as SQL
          // valueOf (shortest decimal repr), NOT new JBigDecimal (exact
          // binary expansion): Spark's double→decimal cast goes through
          // valueOf, and the two can round differently at scale 6
          sum = sum.add(JBigDecimal.valueOf(product).setScale(6, RoundingMode.HALF_UP))
          n += 1
        }
        (flag, sum.doubleValue(), n)
      }
      .toDF("l_returnflag", "revenue", "n_items")
      .orderBy(col("l_returnflag"))
  }

  val qTypedRevenueSql: String =
    s"""SELECT l_returnflag,
       |  ${Exact.sqlSum6("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem WHERE l_orderkey % 10 = 0
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
