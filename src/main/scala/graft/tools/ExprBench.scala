package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Same-session expression A/B: times alternative formulations of one
  * hot expression over the documents corpus through the noop sink
  * (guide §1.4), interleaved ABAB so host drift cancels. The stage-level
  * profilers proved too noisy for expression-sized deltas on this host
  * (identical code swings ±40% run to run); a tight same-session loop
  * isolates the per-row compute.
  *
  * `runMain graft.tools.ExprBench <exprPair> [sfDir] [iters]` */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val which = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables.documents(spark, sfDir)

    val pairs: Map[String, (String, Column, String, Column)] = Map(
      "tokens" -> (("hof",
        filter(split(lower(col("text")), " "), t => t =!= lit("")),
        "native", graft.engine.TextExprs.tokensOf(col("text")))))
    val (nameA, a, nameB, b) = pairs(which)

    def once(c: Column): Double = {
      val t0 = System.nanoTime()
      docs.select(c.as("out")).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(a); once(b) // warm both plans
    val ta = new Array[Double](iters)
    val tb = new Array[Double](iters)
    (0 until iters).foreach { i => ta(i) = once(a); tb(i) = once(b) }
    def stats(t: Array[Double]) = f"min=${t.min}%.3f med=${t.sorted.apply(t.length / 2)}%.3f"
    println(s"[exprbench] $which $nameA: ${stats(ta)}  (${ta.map(v => f"$v%.3f").mkString(",")})")
    println(s"[exprbench] $which $nameB: ${stats(tb)}  (${tb.map(v => f"$v%.3f").mkString(",")})")
    spark.stop()
  }
}
