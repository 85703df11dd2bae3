package graft

import org.apache.spark.sql.functions._

/** Skew handling at runtime: AQE's skew-join split must kick in on a
  * pathologically skewed shuffle join (one key holding ~90% of the fact
  * side) once the thresholds say so — the runtime complement of the
  * salting spec (PlanSpec), which is the compile-time strategy. Confs are
  * set per-test and restored; thresholds are shrunk so the tiny fixture
  * qualifies as skewed. */
class SkewSpec extends SparkSpec {

  test("AQE splits the skewed partition of a sort-merge join") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 100k fact rows, ~90% on key 0; dim is unique keys
      val fact = spark.range(100000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id")).as("payload"))
      val dim = spark.range(100000).select(col("id").as("k"),
        (col("id") % 97).as("attr"))
      val joined = fact.join(dim, "k")
      // collect() finalizes THIS QueryExecution's adaptive plan (count()
      // would execute a different one and leave this plan un-finalized)
      assert(joined.collect().length == 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join (skew=true), plan:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
