package graft.tools

import org.apache.spark.sql.SparkSession

/** Dispatch-floor decomposition: `runMain graft.tools.FloorProf <sfDir> <q>...`
  * splits one timed bench sample of each named query into its serial phases —
  *
  *   build:   SparkEntry.queries(q)(spark, sfDir) — DataFrame construction,
  *            i.e. parquet footer/schema inference per spark.read + analysis
  *   plan:    queryExecution.executedPlan — optimization + physical planning
  *            (+ codegen source generation on first touch)
  *   exec:    toRdd.count() — job scheduling + task run + result
  *
  * so the ~0.3 s floor under ~45 sub-second bench queries can be attributed
  * before anything is "optimized" (VERDICT r13 item 8: profile the floor
  * first; only structural, scale-neutral fixes qualify). Three samples per
  * query, all printed — the floor question is about the steady state, so
  * sample 1 (cold plan/codegen caches) and samples 2-3 (warm) are both
  * interesting. */
object FloorProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // `tables` mode: time the raw spark.read.parquet relation resolution
    // (listing + footer schema inference) per entity, warm, with and
    // without an explicit schema — isolates the read's share of `build`.
    if (names == Seq("tables")) {
      graft.engine.Tables.names.foreach { n =>
        val path = s"$sfDir/$n.parquet"
        def t(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val infer = (1 to 3).map(_ => t(spark.read.parquet(path))).min
        val sch = spark.read.parquet(path).schema
        val given = (1 to 3).map(_ => t(spark.read.schema(sch).parquet(path))).min
        println(f"[floor-read] $n%-12s infer=$infer%6.3f  withSchema=$given%6.3f")
      }
      spark.stop(); return
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t3 = System.nanoTime()
        println(f"[floor] $name%-22s s$i  build=${(t1 - t0) / 1e9}%6.3f  " +
          f"plan=${(t2 - t1) / 1e9}%6.3f  exec=${(t3 - t2) / 1e9}%6.3f  " +
          f"total=${(t3 - t0) / 1e9}%6.3f")
      }
    }
    spark.stop()
  }
}
