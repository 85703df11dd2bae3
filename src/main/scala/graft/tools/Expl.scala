package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan printer: `runMain graft.tools.Expl <sfDir> <query>` prints the
  * executed physical plan of one declared SparkEntry query. The quick
  * companion to PlanAudit (which walks every query structurally into
  * PLANS.md) for iterating on a single plan — e.g. this caught the
  * stratified-sampling filter carrying ~60 copies of event_id after
  * Column-composed xorshift rounds. */
object Expl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
