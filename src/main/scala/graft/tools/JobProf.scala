package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job profiler: `runMain graft.tools.JobProf <sfDir> <q1,q2,...>
  * [warmDir]` runs the named SparkEntry queries (each optionally warmed on
  * `warmDir` first) and prints every Spark job each submitted — duration,
  * task count, and the job's callsite — plus the gaps BETWEEN jobs
  * (driver-side work: planning, FS listing, catalog ops). This is the
  * measure-first tool for multi-job queries (streaming drains, index
  * lifecycles) where the bench second is a sum of dozens of jobs and the
  * plan audit sees only the final frame. */
object JobProf {
  private case class Job(id: Int, t0: Long, var t1: Long, site: String,
      var nTasks: Int)

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
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(js.jobId,
          Job(js.jobId, js.time, -1L, site, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.t1 = je.time
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (args.length > 2) { // warmup on the small dir, untimed
        try fn(spark, args(2)).queryExecution.toRdd.count()
        catch { case e: Throwable =>
          System.err.println(s"[jobprof] warmup failed: ${e.getMessage}") }
      }
      jobs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      import scala.jdk.CollectionConverters._
      val sorted = jobs.values.asScala.toSeq.sortBy(_.t0)
      var prevEnd = if (sorted.nonEmpty) sorted.head.t0 else 0L
      var jobSum = 0.0
      sorted.foreach { j =>
        val gap = (j.t0 - prevEnd) / 1000.0
        val dur = (j.t1 - j.t0) / 1000.0
        jobSum += math.max(dur, 0.0)
        println(f"[jobprof] $name job=${j.id}%3d gapBefore=$gap%7.3f dur=$dur%7.3f tasks=${j.nTasks}%4d  ${j.site}")
        prevEnd = math.max(prevEnd, j.t1)
      }
      println(f"[jobprof] $name TOTAL wall=$wall%.3f s  jobs=${sorted.size}  jobTimeSum=$jobSum%.3f s")
    }
    spark.stop()
  }
}
