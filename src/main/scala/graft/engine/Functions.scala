package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function catalog beyond q_scalar_funcs (SURVEY.md §2b
  * `q_scalar_funcs` row: string/date/math/regex/conditional families) —
  * every query here is a single narrow codegen stage with a DuckDB oracle.
  * Functions are chosen so both engines agree bit-for-bit (noted inline
  * where a family was excluded for dialect divergence, e.g. initcap).
  */
object Functions {

  /** q_string_funcs: pad/trim/replace/reverse/slice/search/levenshtein. */
  def qStringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(
        col("c_custkey"),
        lpad(col("c_name"), 25, "*").as("padded"),
        trim(lit("  x  ")).as("trimmed"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        reverse(col("c_mktsegment")).as("rev_seg"),
        substring(col("c_name"), 1, 8).as("name8"),
        instr(col("c_name"), "0").cast("long").as("zero_at"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long").as("lev_building"),
        repeat(lit("ab"), 3).as("abab"))

  val qStringFuncsSql: String =
    """SELECT c_custkey,
      |  lpad(c_name, 25, '*') AS padded,
      |  trim('  x  ') AS trimmed,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
      |  reverse(c_mktsegment) AS rev_seg,
      |  substring(c_name, 1, 8) AS name8,
      |  CAST(strpos(c_name, '0') AS BIGINT) AS zero_at,
      |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_building,
      |  repeat('ab', 3) AS abab
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** q_datetime_funcs: extract/trunc/offset arithmetic on order dates.
    * ISO weekday via Spark's weekday()+1 (Mon=1..Sun=7) ↔ DuckDB isodow —
    * Spark's dayofweek() (Sun=1) has no stable DuckDB twin. */
  def qDatetimeFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        unix_micros(date_trunc("week", col("o_orderdate"))).as("week_start_us"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(col("o_orderdate").cast("date"), to_date(lit("1995-01-01"))).cast("long").as("days_since_95"))

  val qDatetimeFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  CAST(day(o_orderdate) AS BIGINT) AS dom,
      |  CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |  epoch_us(date_trunc('week', o_orderdate)) AS week_start_us,
      |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
      |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q_conditional_funcs: CASE/coalesce/nullif/greatest/least/if — the
    * branching scalar family. All-integer outputs, no float boundaries. */
  def qConditionalFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        when(col("l_quantity") >= 25, lit("bulk"))
          .when(col("l_quantity") >= 10, lit("mid"))
          .otherwise(lit("small")).as("size_class"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("~none~")).as("flag_or_none"),
        greatest(col("l_partkey"), col("l_suppkey")).as("max_key"),
        least(col("l_partkey"), col("l_suppkey")).as("min_key"),
        (col("l_tax") > col("l_discount")).as("tax_gt_disc"))

  val qConditionalFuncsSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CASE WHEN l_quantity >= 25 THEN 'bulk'
      |       WHEN l_quantity >= 10 THEN 'mid' ELSE 'small' END AS size_class,
      |  coalesce(nullif(l_returnflag, 'N'), '~none~') AS flag_or_none,
      |  greatest(l_partkey, l_suppkey) AS max_key,
      |  least(l_partkey, l_suppkey) AS min_key,
      |  l_tax > l_discount AS tax_gt_disc
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** q_regex_funcs: extract/match/count over the props JSON text (simple
    * character-class patterns — identical under Java regex and RE2). */
  def qRegexFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        regexp_extract(col("props"), "[0-9]+", 0).as("first_num"),
        col("props").rlike("[0-9]{2,}").as("has_2digits"),
        regexp_count(col("props"), lit("[0-9]")).cast("long").as("n_digits"),
        regexp_replace(col("event_type"), "[aeiou]", "_").as("devoweled"))

  val qRegexFuncsSql: String =
    """SELECT event_id,
      |  regexp_extract(props, '[0-9]+', 0) AS first_num,
      |  regexp_matches(props, '[0-9]{2,}') AS has_2digits,
      |  CAST(len(regexp_extract_all(props, '[0-9]')) AS BIGINT) AS n_digits,
      |  regexp_replace(event_type, '[aeiou]', '_', 'g') AS devoweled
      |FROM events ORDER BY event_id""".stripMargin
}
