package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions — the 100 TB posture, locked in as tests
  * so a refactor can't silently regress scan pruning, broadcast choice, or
  * top-k planning (SURVEY.md §4/§7 "bench hardening"). */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q_scan_project: parquet reads only the projected columns") {
    val p = plan(graft.engine.Relational.qScanProject(spark, sf))
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_extendedprice"), "unprojected column must not be read")
  }

  test("q_filter_range: the window predicate reaches the parquet scan (NanosRangePushdown)") {
    val p = plan(graft.engine.Incremental.qFilterRange(spark, sf))
    // raw nanosecond bounds: 2024-01-08T00:00Z and 2024-01-15T00:00Z in ns
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,1704672000000000000), LessThan(ts,1705276800000000000)]"),
      s"expected raw-ns pushed filters, plan:\n${p.take(2000)}")
  }

  test("q_expand_join / q_join_multiway: dimension joins broadcast") {
    val p1 = plan(graft.engine.Relational.qExpandJoin(spark, sf))
    assert(p1.contains("BroadcastHashJoin"))
    val p2 = plan(graft.engine.Relational.qJoinMultiway(spark, sf))
    assert(p2.contains("BroadcastHashJoin"))
  }

  test("q_topk: ORDER BY + LIMIT plans as TakeOrderedAndProject, no global sort") {
    val p = plan(graft.engine.Relational.qTopk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_agg_hash: hash aggregate with map-side partial aggregation") {
    val p = plan(graft.engine.Relational.qAggHash(spark, sf))
    assert(p.contains("HashAggregate"))
    // partial + final => two HashAggregate nodes around the exchange
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2)
  }

  test("q_sim_topk: query side broadcasts; corpus is scanned, not shuffled") {
    val p = plan(graft.engine.LlmOps.qSimTopk(spark, sf))
    assert(p.contains("Broadcast"))
  }

  test("NanosRangePushdown: truncation-correct bounds for negative (pre-1970) nanos") {
    import spark.implicits._
    graft.plans.NanosRangePushdown.install(spark)
    // raw nanos straddling the epoch; trunc-toward-zero ≠ floor below 0
    val xs = Seq(-2000L, -1999L, -1500L, -1000L, -999L, -500L, -1L, 0L,
      1L, 499L, 500L, 999L, 1000L, 1500L, 2000L)
    // parquet, not a local relation: ConvertToLocalRelation would evaluate
    // the original predicate before extraOptimizations ever run
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos").toString
    xs.toDF("x").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    // every (op, µs-bound) pair the rule rewrites, around zero where the
    // original IntegralDivide semantics and a naive ·1000 rewrite diverge
    for (us <- Seq(-2L, -1L, 0L, 1L); op <- Seq(">=", ">", "<", "<=")) {
      val out = df.filter(
        s"timestamp_micros(x div 1000) $op timestamp_micros(${us}L)")
        .collect().map(_.getLong(0)).toSet
      val expect = xs.filter { x =>
        val t = x / 1000 // Scala / on Long is trunc-toward-zero, like div
        op match {
          case ">=" => t >= us; case ">" => t > us
          case "<" => t < us; case "<=" => t <= us
        }
      }.toSet
      assert(out == expect, s"op=$op us=$us: got $out expected $expect")
    }
  }

  test("q_string_cast: single narrow projection, no exchange before sort") {
    val p = plan(graft.engine.Cast.qStringCast(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"),
      "a scalar cast must not introduce a hash shuffle")
  }
}
