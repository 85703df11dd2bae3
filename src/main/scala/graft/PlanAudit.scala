package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Plan audit main: walks the final (post-AQE) physical plan of every
  * declared query and summarizes exchanges, scans, broadcasts, codegen
  * spans, and pushdown into PLANS.md — the ".explain and iterate" loop
  * (builder prompt / SURVEY §7 bench hardening) made reviewable.
  *
  * Counts are structural, not string matches: the walker recurses into
  * AQE query stages and reused exchanges (counted once) and stops at
  * InMemoryTableScan leaves — a cached relation's build plan ran once at
  * materialization, so counting its nodes per consumer (as a toString
  * scan does) overstates iterative queries ~10×. Run:
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01 PLANS.md"
  */
object PlanAudit {

  final case class Tally(
      var shuffles: Int = 0, var broadcasts: Int = 0, var scans: Int = 0,
      var sorts: Int = 0, var codegen: Int = 0, var pushed: Boolean = false)

  /** Walk the physical plan counting structural features. Recurses into
    * query stages and subqueries; ReusedExchange subtrees executed once —
    * skipped. */
  def tally(plan: SparkPlan, t: Tally, seen: java.util.IdentityHashMap[SparkPlan, Unit]): Unit = {
    if (seen.containsKey(plan)) return
    seen.put(plan, ())
    plan match {
      case a: AdaptiveSparkPlanExec => tally(a.executedPlan, t, seen); return
      case q: QueryStageExec        => tally(q.plan, t, seen); return
      case _: ReusedExchangeExec    => return // ran once elsewhere
      case s: ShuffleExchangeLike   => t.shuffles += 1; tally(s.child, t, seen); return
      case b: BroadcastExchangeLike => t.broadcasts += 1; tally(b.child, t, seen); return
      case w: WholeStageCodegenExec => t.codegen += 1; tally(w.child, t, seen); return
      case _: SortExec              => t.sorts += 1
      case _: InMemoryTableScanExec => t.scans += 1; return // cached: built once
      case f: FileSourceScanExec =>
        t.scans += 1
        if (f.metadata.get("PushedFilters").exists(v => v != "[]" && v.nonEmpty)) t.pushed = true
      case s: BatchScanExec =>
        t.scans += 1
        if (s.scan.description().contains("lo=") || s.scan.description().contains("Pushed")) t.pushed = true
      case _: RDDScanExec | _: RowDataSourceScanExec | _: LocalTableScanExec => t.scans += 1
      case _ =>
    }
    plan.children.foreach(tally(_, t, seen))
    plan.subqueries.foreach(tally(_, t, seen))
  }

  def audit(df: DataFrame): Tally = {
    df.collect() // materialize on the SAME QueryExecution so AQE finalizes
    val t = Tally()
    tally(df.queryExecution.executedPlan, t, new java.util.IdentityHashMap)
    t
  }

  /** Runtime exchange counter: a SparkListener tallying what actually
    * EXECUTED, not what the final plan tree contains. Eagerly-materialized
    * stages (Iterate.cut lineage truncation, BigWindow's chunked pass,
    * micro-batch drains) run their shuffles BEFORE the audited plan exists,
    * so the structural walk reports them as 0-shuffle leaf scans — the
    * round-6 PLANS.md blind spot. Counting here:
    *  - shuffles  = distinct ShuffleDependency ids across submitted stages
    *    (StageInfo.shuffleDepId); AQE-reused exchanges are skipped stages,
    *    never resubmitted, so "counted once" matches executed-once;
    *  - broadcasts = jobs whose description carries the engine's
    *    "broadcast exchange (runId ..." job-group tag
    *    (BroadcastExchangeLike.submitBroadcastJob). */
  final class RuntimeCounter extends org.apache.spark.scheduler.SparkListener {
    private val shuffleIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    private val bcastJobs = new java.util.concurrent.atomic.AtomicInteger
    private val stampCtr = new java.util.concurrent.atomic.AtomicLong
    def shuffles: Int = shuffleIds.size
    def broadcasts: Int = bcastJobs.get
    def stamp: Long = stampCtr.get
    // StageInfo.shuffleDepId is private[spark] at compile time but public
    // in bytecode — one reflected getter, resolved once
    private val depIdGetter =
      classOf[org.apache.spark.scheduler.StageInfo].getMethod("shuffleDepId")
    override def onStageSubmitted(
        e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
      depIdGetter.invoke(e.stageInfo).asInstanceOf[Option[Int]]
        .foreach(id => shuffleIds.add(id))
      stampCtr.incrementAndGet()
    }
    override def onJobStart(
        e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      // Spark 4 carries the broadcast-exchange marker as a job TAG
      // (spark.job.tags), not the job description. The TAG channel matches
      // the bare word "broadcast" (case-insensitive) so a minor rewording
      // in a Spark upgrade doesn't silently zero the counter; the
      // DESCRIPTION channel is free text (setJobDescription, SQL text — a
      // /*+ BROADCAST */ hint or a *broadcast*-named call site would
      // overcount), so it requires the full "broadcast exchange" phrase.
      // The wording contract itself is pinned by PlanSpec's tight broadcast
      // self-check (rtBcast == structural > 0 on a known broadcast join),
      // which trips if the tag disappears entirely.
      val marked = Option(e.properties).exists { p =>
        Option(p.getProperty("spark.job.tags"))
          .exists(_.toLowerCase.contains("broadcast")) ||
        Option(p.getProperty("spark.job.description"))
          .exists(_.toLowerCase.contains("broadcast exchange"))
      }
      if (marked) bcastJobs.incrementAndGet()
      stampCtr.incrementAndGet()
    }
    override def onJobEnd(
        e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      stampCtr.incrementAndGet(); ()
    }
  }

  /** Listener events are async — wait until the bus goes quiet (two
    * consecutive unchanged stamps, 100 ms apart; 3 s cap) before reading
    * or snapshotting the counters. */
  def quiesce(c: RuntimeCounter): Unit = {
    var last = -1L; var stable = 0
    val deadline = System.nanoTime + 3000000000L
    while (stable < 2 && System.nanoTime < deadline) {
      val s = c.stamp
      if (s == last) stable += 1 else { stable = 0; last = s }
      Thread.sleep(100)
    }
  }

  /** Audit a query INCLUDING its construction-time work: snapshots the
    * runtime counters around `build` + materialization, so eager stages
    * are attributed to the query that ran them. Returns the structural
    * tally plus (runtime shuffles, runtime broadcasts). */
  def auditRuntime(c: RuntimeCounter)(build: => DataFrame): (Tally, Int, Int) = {
    quiesce(c) // flush stragglers from the previous query
    val sh0 = c.shuffles; val bc0 = c.broadcasts
    val df = build
    val t = audit(df)
    quiesce(c)
    (t, c.shuffles - sh0, c.broadcasts - bc0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1) else "PLANS.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val counter = new RuntimeCounter
    spark.sparkContext.addSparkListener(counter)

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val (t, rtSh, rtBc) = auditRuntime(counter)(fn(spark, sfDir))
        val pushed = if (t.pushed) "yes" else "-"
        f"| $name%-22s | ${t.shuffles}%2d | ${t.broadcasts}%2d | $rtSh%2d | $rtBc%2d | ${t.scans}%2d | ${t.sorts}%2d | ${t.codegen}%2d | $pushed |"
      } catch {
        case e: Throwable => f"| $name%-22s | plan failed: ${e.getMessage.take(60)} |"
      }
    }
    val header =
      """# PLANS — physical-plan audit of every declared query (sf0.01)
        |
        |Generated by `graft.PlanAudit`. `shfl`/`bcast` are the STRUCTURAL
        |walk of the post-AQE executed plan (cached/reused subtrees counted
        |once); `rtShfl`/`rtBcast` are RUNTIME counts from a SparkListener
        |around construction + materialization — distinct shuffle
        |dependencies whose map stages actually ran, and broadcast-exchange
        |jobs actually submitted. Eagerly-materialized queries (Iterate.cut,
        |BigWindow, micro-batch drains) show their true totals in the
        |runtime columns even though their declared frame is a leaf scan.
        |Runtime > structural ⇒ eager/cached work; runtime < structural ⇒
        |AQE reused an exchange across the tree. Remaining columns: scans,
        |sorts, whole-stage-codegen spans, filter pushdown reached a scan.
        |
        || query | shfl | bcast | rtShfl | rtBcast | scans | sorts | codegen | pushdown |
        ||---|---|---|---|---|---|---|---|---|""".stripMargin
    Files.writeString(Paths.get(outFile), (header +: rows).mkString("\n") + "\n")
    println(s"[plan-audit] wrote ${rows.size} rows to $outFile")
    spark.stop()
  }
}
