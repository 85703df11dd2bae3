package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's record envelope (SURVEY.md §1.3) as narrow column ops:
  * key extraction + null-key drop (R7, ChargeOverSourceTask.java:394-449),
  * metadata enrichment (R8, :426-428), topic routing (R9, :419).
  *
  * All three are deterministic scalar projections — Catalyst pipelines them
  * into the same whole-stage-codegen stage as the scan; zero shuffles.
  * At 100 TB the routing column doubles as the write partition key
  * (`df.write.partitionBy("_entity_type")`), mirroring topic-per-entity.
  */
object Envelope {

  /** R7: project the configured id field as record key, DROP records whose
    * id is missing (reference logs+skips, ChargeOverSourceTask.java:398-401).
    * Key is stringified like the reference's `asText()` (:398). */
  def keyed(df: DataFrame, idField: String): DataFrame =
    df.filter(col(idField).isNotNull)
      .withColumn("key", col(idField).cast("string"))

  /** R8: `_entity_type`, `_load_mode` literals; `_ingestion_timestamp` is
    * epoch millis in the reference (System.currentTimeMillis, :427) — made
    * deterministic here by passing the batch-start time in, the way the
    * reference pins `batch_end_datetime` at batch start (:245-262). */
  def enriched(df: DataFrame, entity: String, loadMode: String, ingestionMillis: Long): DataFrame =
    df.withColumn("_entity_type", lit(entity))
      .withColumn("_ingestion_timestamp", lit(ingestionMillis))
      .withColumn("_load_mode", lit(loadMode))

  /** R9: topic routing `{prefix}.{entity}` (ChargeOverSourceTask.java:419). */
  def routed(df: DataFrame, prefix: String): DataFrame =
    df.withColumn("topic", concat_ws(".", lit(prefix), col("_entity_type")))

  /** q_key_route: R7+R8+R9 composed on `events`. */
  def qKeyRoute(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    routed(enriched(keyed(e, "event_id"), "events", "INCREMENTAL_LOAD", 1730476800000L), "chargeover")
      .select(col("event_id"), col("key"), col("_entity_type"),
        col("_ingestion_timestamp"), col("_load_mode"), col("topic"))
  }

  val qKeyRouteSql: String =
    """SELECT event_id, CAST(event_id AS VARCHAR) AS key,
      |  'events' AS _entity_type, CAST(1730476800000 AS BIGINT) AS _ingestion_timestamp,
      |  'INCREMENTAL_LOAD' AS _load_mode, 'chargeover.events' AS topic
      |FROM events WHERE event_id IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** Flagship: the reference's entire data path as ONE DataFrame expression
    * (SURVEY.md §7 step 1) — half-open incremental window (R2/R10), stable
    * ASC order + page (R3/R4), null-key drop + key (R7), metadata (R8),
    * topic routing (R9). Scan→filter→page→project stays a single codegen
    * stage plus a TakeOrdered for the page. */
  def flagship(spark: SparkSession, sfDir: String): DataFrame = {
    val windowed = Incremental.filterRange(
      Tables.events(spark, sfDir), "ts", "2024-01-05 00:00:00", "2024-01-20 00:00:00")
    val paged = Incremental.page(windowed, "ts", "event_id", 0, 500)
    routed(enriched(keyed(paged, "event_id"), "events", "INITIAL_LOAD", 1730476800000L), "chargeover")
  }
}
