package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage profiler: `runMain graft.tools.StageProf <sfDir> <q1,q2,...>
  * [warmDir]` runs the named SparkEntry queries and prints every completed
  * stage — wall duration, task count, executor-run/cpu time sums, shuffle
  * bytes, and the stage name (operator callsite). The stage-granular
  * companion of JobProf: a 2 s job with 5 stages tells you nothing about
  * WHICH exchange/sort/agg owns the time. */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield (a - b) / 1000.0).getOrElse(-1.0)
        lines.add(f"[stageprof] stage=${si.stageId}%4d wall=$wall%7.3f " +
          f"tasks=${si.numTasks}%4d run=${m.executorRunTime / 1000.0}%7.3f " +
          f"cpu=${m.executorCpuTime / 1e9}%7.3f " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB  ${si.name.take(110)}")
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (args.length > 2) {
        try fn(spark, args(2)).queryExecution.toRdd.count()
        catch { case e: Throwable =>
          System.err.println(s"[stageprof] warmup failed: ${e.getMessage}") }
      }
      lines.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      lines.forEach(println)
      println(f"[stageprof] $name TOTAL wall=$wall%.3f s")
    }
    spark.stop()
  }
}
