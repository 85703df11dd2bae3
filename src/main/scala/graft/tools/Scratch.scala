package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

/** Plan dumper: `runMain graft.tools.Scratch <outFile> <name> [sfDir]`
  * writes the formatted physical plan of a declared SparkEntry query —
  * or one of the named internal kernels below — after materializing it
  * through the noop sink (guide §1.4), so AQE's final plan is what gets
  * dumped. sfDir falls back to $SPARK_GRAFT_SF_DIR; the session mirrors
  * the bench contract (local[$SPARK_GRAFT_CPUS], shuffle.partitions =
  * cpus) instead of a hard-coded host layout.
  *
  * `dedup_pairs_kernel` is the sparse-Jaccard posting-pairs kernel as
  * q_dedup_groups invokes it (constant source) — its consumers' declared
  * frames are materialized cut leaves, so the kernel must be dumped
  * directly for the plans/<round>/ evidence files. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val name = args(1)
    val sfDir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = name match {
      case "dedup_pairs_kernel" =>
        graft.engine.LlmOps.sparseJaccardPairs(
          graft.engine.Tables.documents(spark, sfDir)
            .select(lit("all").as("source"), col("doc_id"), col("text")))
      case q => graft.SparkEntry.queries(q)(spark, sfDir)
    }
    df.write.format("noop").mode("overwrite").save()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
