package graft

import org.apache.spark.sql.functions._
import graft.sources.PagedEntitySource

/** DSv2 paginated source: pages == partitions, window pushdown prunes
  * pages at planning time, fields= prunes the read schema. */
class PagedSourceSpec extends SparkSpec {

  private def src(rows: Int, pageSize: Int) =
    spark.read.format("graft.sources.PagedEntitySource")
      .option("rows", rows.toString).option("pageSize", pageSize.toString)
      .load()

  test("serves rows ordered by ts, one partition per page") {
    val df = src(1000, 100)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 10)
    // R3: ts strictly ascending with id
    val bad = df.filter(col("ts_us") =!= (lit(PagedEntitySource.BaseUs) +
      col("id") * PagedEntitySource.StepUs))
    assert(bad.count() == 0)
  }

  test("half-open ts window is pushed down and PRUNES PAGES at planning time") {
    val df = src(1000, 100)
    val a = PagedEntitySource.tsOf(250)
    val b = PagedEntitySource.tsOf(450)
    val win = df.filter(col("ts_us") >= a && col("ts_us") < b)
    assert(win.count() == 200)
    // offset pagination restarts at the window start (reference semantics):
    // ids 250..449 → pages [250,350),[350,450) → 2 partitions, not 10
    assert(win.rdd.getNumPartitions == 2,
      s"expected 2 planned pages, got ${win.rdd.getNumPartitions}")
    val plan = win.queryExecution.executedPlan.toString
    assert(plan.contains("PagedScan(lo=250, hi=450"),
      s"pushdown must narrow the scan range:\n${plan.take(1200)}")
  }

  test("multi-entity load: per-entity rows/fields/params, _entity_type routing") {
    val df = spark.read.format("graft.sources.PagedEntitySource")
      .option("entities", "customer,invoice")
      .option("pageSize", "100")
      .option("customer.rows", "250")
      .option("customer.fields", "id,ts_us,value")   // no category served
      .option("invoice.rows", "400")
      .option("invoice.params", "category_mod=3")    // per-entity query param
      .load()
    // per-entity row counts under one _entity_type-discriminated frame
    val counts = df.groupBy(col("_entity_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("customer" -> 250L, "invoice" -> 400L))
    // per-entity fields=: customer's unrequested category is null,
    // invoice (no projection) serves everything
    assert(df.filter(col("_entity_type") === "customer" &&
      col("category").isNotNull).count() == 0)
    assert(df.filter(col("_entity_type") === "invoice" &&
      col("category").isNull).count() == 0)
    // per-entity extra param honored by the "remote": 3 categories
    assert(df.filter(col("_entity_type") === "invoice")
      .select(col("category")).distinct().count() == 3)
  }

  test("entity predicate prunes whole entity streams at planning time") {
    val df = spark.read.format("graft.sources.PagedEntitySource")
      .option("entities", "customer,invoice")
      .option("pageSize", "100")
      .option("customer.rows", "200")
      .option("invoice.rows", "600")
      .load()
    val one = df.filter(col("_entity_type") === "customer")
    assert(one.count() == 200)
    // only customer's 2 pages are planned, not invoice's 6
    assert(one.rdd.getNumPartitions == 2,
      s"expected entity pruning to 2 pages, got ${one.rdd.getNumPartitions}")
    // ts window still composes with entity pruning
    val win = df.filter(col("_entity_type") === "invoice" &&
      col("ts_us") >= PagedEntitySource.tsOf(100) &&
      col("ts_us") < PagedEntitySource.tsOf(300))
    assert(win.count() == 200 && win.rdd.getNumPartitions == 2)
  }

  test("Long.MaxValue bounds don't overflow the +1 pushdown arithmetic") {
    val df = src(100, 10)
    // ts_us <= MaxValue is all rows; the naive v+1 wrapped to MinValue and
    // served ZERO rows (DSv2 trusts accepted filters) — now left residual
    assert(df.filter(col("ts_us") <= Long.MaxValue).count() == 100)
    // ts_us > MaxValue is unsatisfiable; must be 0 via residual, not wrap
    assert(df.filter(col("ts_us") > Long.MaxValue).count() == 0)
    // sanity: non-boundary GT/LTE still push and stay correct
    val a = PagedEntitySource.tsOf(10)
    assert(df.filter(col("ts_us") > a).count() == 89)
    assert(df.filter(col("ts_us") <= a).count() == 11)
  }

  test("column pruning reaches the source (fields= analog)") {
    val df = src(500, 100).select(col("id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("fields=id)"), s"expected pruned fields in:\n${plan.take(1200)}")
    assert(df.count() == 500)
  }

  test("page boundary semantics: last short page, empty window, exact-multiple") {
    assert(src(250, 100).rdd.getNumPartitions == 3)   // 100+100+50
    assert(src(300, 100).rdd.getNumPartitions == 3)   // no phantom empty page
    val empty = src(1000, 100)
      .filter(col("ts_us") >= PagedEntitySource.tsOf(5000))
    assert(empty.count() == 0 && empty.rdd.getNumPartitions == 0)
  }

  test("limit/offset are pushed into the page plan (R4)") {
    // offset 230, limit 150 → ids [230, 380) → pages [230,330),[330,380)
    val df = src(1000, 100).offset(230).limit(150)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PagedScan(lo=230, hi=380"),
      s"offset+limit must narrow the scan range:\n${plan.take(1200)}")
    assert(df.count() == 150)
    val ids = df.select(col("id")).collect().map(_.getLong(0)).sorted
    assert(ids.head == 230 && ids.last == 379)
  }

  test("ORDER BY id LIMIT is pushed as TopN; non-native order is declined") {
    val top = src(1000, 100).orderBy(col("id")).limit(42)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("PagedScan(lo=0, hi=42"),
      s"TopN on the native order must cap the page plan:\n${plan.take(1200)}")
    assert(top.count() == 42)
    // descending order is NOT the source's native order: full range planned
    val desc = src(1000, 100).orderBy(col("id").desc).limit(5).select(col("id"))
    val dplan = desc.queryExecution.executedPlan.toString
    assert(dplan.contains("hi=1000"),
      s"non-native TopN must be declined:\n${dplan.take(1200)}")
    assert(desc.collect().map(_.getLong(0)).toSeq == Seq(999L, 998L, 997L, 996L, 995L))
  }

  test("values and categories are deterministic across reads") {
    val r1 = src(100, 7).orderBy(col("id")).collect()
    val r2 = src(100, 13).orderBy(col("id")).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
      "page size must not change the data, only the partitioning")
  }
}
