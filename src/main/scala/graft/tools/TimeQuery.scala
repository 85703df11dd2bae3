package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused timing harness: `runMain graft.tools.TimeQuery <sfDir> <q>...`
  * times the named SparkEntry queries (min of 2, full materialization via
  * toRdd — same methodology as Bench) and prints one line per query with
  * the run's shuffle/spill deltas. For iterating on a single query without
  * paying the full 70-query bench. */
object TimeQuery {
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
    spark.sparkContext.setLogLevel("WARN")
    val shRead = new java.util.concurrent.atomic.AtomicLong
    val spilled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spilled.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val r0 = shRead.get; val s0 = spilled.get
      val t = math.min(once(), once())
      println(f"[timequery] $name%-22s $t%8.3f s  shuffleRead=${(shRead.get - r0) / 1e9}%.2f GB  spill=${(spilled.get - s0) / 1e9}%.2f GB")
    }
    spark.stop()
  }
}
