package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The reference's paginated, pushdown-aware entity scan (SURVEY.md §2a
  * R1-R5) as a genuine DataSource V2 connector.
  *
  * The reference pages a remote API: `limit/offset` pagination (R4) over a
  * stable `order=ts:ASC` (R3), with the incremental window pushed into the
  * request as `where=ts:GTE:a,ts:LT:b` (R2) and the projection as
  * `fields=` (R5) — ChargeOverApiClient.java:80-183. The Spark-native
  * translation, one concept at a time:
  *
  *  - one API PAGE == one `InputPartition` (pagination is partition
  *    planning; pages fetch in parallel, the reference's sequential loop
  *    is the 1-task degenerate case);
  *  - `where` pushdown == `SupportsPushDownFilters` on the ordered ts
  *    column, applied at PLANNING time: out-of-window pages are never
  *    planned (the scan's page count shrinks — observable as fewer RDD
  *    partitions);
  *  - `fields=` == `SupportsPushDownRequiredColumns`;
  *  - `hasMore == (fetched == limit)` == the planner computing page count
  *    from the (filter-narrowed) row range.
  *
  * The "remote system" is simulated by a deterministic generator (id-dense,
  * one record per minute per id) so the connector is self-contained and
  * its pushdown behavior is exactly checkable. With `endpoint=http://…`
  * the generator is swapped for a GENUINE HTTP page fetch: each planned
  * page issues the reference's request verbatim —
  * `GET {endpoint}/{entity}?limit=&offset=&where=ts_us:GTE:a,ts_us:LT:b
  * &order=ts_us:ASC&fields=…` under Basic auth
  * (ChargeOverApiClient.java:80-145), unwraps the `{"response":[…]}`
  * envelope (:149-158), treats 429 as the rate-limited failure flavor
  * (:169-171) and any other non-200 as a transient fetch failure
  * (:171-175) — all under the same reference-exact retry loop
  * (fetchBatchWithRetry, ChargeOverSourceTask.java:296-343) the
  * generator's fault plan exercises. Tests serve the generator's records
  * over a localhost `com.sun.net.httpserver` fixture, so the retry path
  * runs against real sockets and real status codes with no new
  * dependencies.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.PagedEntitySource")
  *   .option("rows", 100000).option("pageSize", 500)   // batch.size ≤ 500
  *   .load()
  * }}}
  *
  * Streaming — the reference's CONTINUOUS identity (poll loop,
  * ChargeOverSourceTask.java:136-173) — reads the same table through a
  * genuine `MicroBatchStream` ([[PagedMicroBatchStream]]): one page per
  * poll, windowed INITIAL→INCREMENTAL progression, offsets carrying the
  * reference's 7-field state map; multi-entity mode streams every entity
  * with its own independent state machine
  * ([[PagedMultiMicroBatchStream]]):
  * {{{
  * spark.readStream.format("graft.sources.PagedEntitySource")
  *   .option("rows", 100000).option("pageSize", 500)
  *   .option("windowRows", 1440)   // id==minute ⇒ the daily cron window
  *   .load()
  * }}}
  *
  * Multi-entity mode mirrors `chargeover.entities` + per-entity query
  * params (`getQueryParamsForEntity`, Config.java:279-289; entity list
  * Config.java:79-83): `entities=customer,invoice` loads every entity in
  * one frame with an `_entity_type` discriminator column, and each entity
  * can carry its own server-side projection and params —
  * {{{
  * spark.read.format("graft.sources.PagedEntitySource")
  *   .option("entities", "customer,invoice")
  *   .option("customer.rows", 1000)
  *   .option("customer.fields", "id,ts_us,value")      // fields= analog
  *   .option("invoice.params", "category_mod=3")       // extra query params
  *   .load()
  * }}}
  * Unrequested fields come back null (schemaless records simply lack
  * them); `_entity_type = 'x'` predicates prune whole entities at
  * planning time (the analog of not polling that entity at all).
  */
class PagedEntitySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.containsKey("entities")) PagedEntitySource.multiSchema
    else PagedEntitySource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val pageSize = properties.getOrDefault("pageSize", "500").toInt
    // the reference range-validates batch.size into [1, 500] at config
    // time (ConfigDef.Range.between, Config.java:53-58) — same hard bound
    // here, at table resolution: a zero page divides by zero in page
    // planning, an oversized one breaks the per-poll admission contract
    if (pageSize < 1 || pageSize > 500)
      throw new IllegalArgumentException(
        s"pageSize must be in [1, 500] (the reference's batch.size range), got $pageSize")
    val defaultRows = properties.getOrDefault("rows", "10000").toLong
    if (defaultRows < 0)
      throw new IllegalArgumentException(s"rows must be >= 0, got $defaultRows")
    // streaming: ids advance one per minute, so an id window IS a time
    // window — windowRows=1440 is the daily `0 0 0 * * ?` cron window.
    // 0 (default) = one window covering everything (pure initial load).
    val windowRows = properties.getOrDefault("windowRows", "0").toLong
    if (windowRows < 0)
      throw new IllegalArgumentException(s"windowRows must be >= 0, got $windowRows")
    val faults = PagedEntitySource.faultPlan(properties)
    if (properties.containsKey("entities")) {
      val confs = properties.get("entities").split(",").map(_.trim).filter(_.nonEmpty)
        .map(e => PagedEntitySource.entityConf(e, properties, defaultRows))
      new PagedEntityTable(confs.toSeq, pageSize, multi = true, windowRows, faults)
    } else {
      val e = properties.getOrDefault("entity", "events")
      new PagedEntityTable(
        Seq(PagedEntitySource.entityConf(e, properties, defaultRows)),
        pageSize, multi = false, windowRows, faults)
    }
  }
}

object PagedEntitySource {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Epoch micros of the stream origin (2024-01-01 00:00:00 UTC). */
  val BaseUs: Long = 1704067200000000L
  /** One record per minute, ts strictly ascending with id (R3's invariant). */
  val StepUs: Long = 60000000L

  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("category", StringType, nullable = false)))

  /** Multi-entity frames carry the routing discriminator (R8/R9; the
    * reference's `_entity_type`, Task.java:426-428). Data fields are
    * nullable: a per-entity `fields=` projection means the "API response"
    * simply lacks the others. */
  val multiSchema: StructType = StructType(
    StructField("_entity_type", StringType, nullable = false) +:
    fullSchema.fields.map(f =>
      if (f.name == "id") f else f.copy(nullable = true)).toSeq)

  /** Per-entity config (getQueryParamsForEntity, Config.java:279-289):
    * row count, server-side field projection, and extra query params —
    * the simulated remote honors `category_mod=<n>` (response category
    * cardinality) and `update_every=<k>` (upsert-changelog mode, below),
    * unknown params are ignored like any REST API ignores unknown query
    * strings.
    *
    * `updateEvery = k >= 2` turns the generator into the reference's TRUE
    * stream shape — an UPSERT CHANGELOG (§2a quirks: a re-modified entity
    * re-appears in a later window with a later timestamp,
    * ChargeOverSourceTask.java:431-432; consumers keep the latest by key).
    * The generator's domain becomes changelog POSITIONS: `rows` counts
    * positions, every k-th position (p % k == k-1) re-emits an UPDATED
    * version of an earlier id instead of a new id. Closed form, so DuckDB
    * replays it exactly:
    *
    *   updates_before(p) = p / k            (update positions ≡ k-1 mod k)
    *   new_idx(p)        = p - p / k
    *   id(p)  = new_idx(p)                  for new positions
    *          = new_idx(p) / 2              for update positions — always
    *                                        an id already emitted earlier
    *   ver(p) = 1 for updates, 0 for new
    *   ts(p)  = tsOf(p)                     strictly ascending: the update
    *                                        is LATER, dedup-latest keeps it
    *   value  = ((id·7919 + ver·1000003) % 100000) / 100.0
    *
    * An id can be updated more than once (k=2 targets repeat) — more
    * changelog realism, and latest-wins stays provable because ts is
    * unique per position. */
  final case class EntityConf(name: String, rows: Long,
    fields: Option[Set[String]], categoryMod: Int, updateEvery: Int = 0,
    remote: Option[RemoteApi] = None)

  /** A real REST backend for the page fetches (`endpoint` option): base
    * URL plus the Basic-auth credentials the reference sends on every
    * request (ChargeOverApiClient.java:139-143). `shortPageEndOfData`
    * selects between the two legal readings of a page shorter than its
    * planned extent (`shortPage` option): the reference's REST contract
    * treats it as the normal end-of-data signal (`hasMore = fetched ==
    * limit`, ChargeOverApiClient.java:164-165) — a backend with sparse
    * data simply runs out of rows — while the dense-id fixture's extent
    * is exact, so a short page there means the backend truncated the
    * planned window and silence would be data loss. Default strict
    * (fail), `shortPage=end_of_data` for reference-faithful paging. */
  final case class RemoteApi(endpoint: String, username: String,
      password: String, shortPageEndOfData: Boolean = false)

  private[sources] def entityConf(e: String, props: util.Map[String, String],
      defaultRows: Long): EntityConf = {
    // names feed option prefixes and the checkpoint offset JSON — anything
    // outside this set either aliases another option key (a dot) or writes
    // malformed JSON into the offset log (quote/backslash), so reject at
    // table resolution like the other config ranges
    if (!e.matches("[A-Za-z0-9_-]+"))
      throw new IllegalArgumentException(
        s"entity name must match [A-Za-z0-9_-]+, got '$e'")
    val fields = Option(props.get(s"$e.fields"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val params = Option(props.get(s"$e.params")).getOrElse("")
      .split("&").flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k.trim -> v.trim)
        case _ => None
      }).toMap
    val rows = Option(props.get(s"$e.rows")).map(_.toLong).getOrElse(defaultRows)
    if (rows < 0)
      throw new IllegalArgumentException(s"$e.rows must be >= 0, got $rows")
    val updateEvery = params.get("update_every").map(_.toInt).getOrElse(
      Option(props.get("updatesEveryN")).map(_.toInt).getOrElse(0))
    if (updateEvery < 0 || updateEvery == 1)
      throw new IllegalArgumentException(
        s"update_every must be 0 (off) or >= 2, got $updateEvery")
    val remote = Option(props.get("endpoint")).map(_.trim).filter(_.nonEmpty)
      .map { url =>
        val explicitUser = props.get("username") != null
        val explicitPass = props.get("password") != null
        // Basic auth over plain http is cleartext on the wire; defaulted
        // credentials on top of that are a footgun the moment `endpoint`
        // names anything but the localhost fixture. Warn loudly (the
        // fixture path stays usable; a real deployment sets both options
        // and uses https).
        if (url.startsWith("http://") && !(explicitUser && explicitPass))
          log.warn(s"paged source endpoint '$url' uses plain http with " +
            "defaulted Basic-auth credentials; set username/password " +
            "options (and prefer https) for any non-local backend")
        val shortPage = props.getOrDefault("shortPage", "strict")
        if (shortPage != "strict" && shortPage != "end_of_data")
          throw new IllegalArgumentException(
            s"shortPage must be 'strict' or 'end_of_data', got '$shortPage'")
        RemoteApi(if (url.endsWith("/")) url.dropRight(1) else url,
          props.getOrDefault("username", "graft"),
          props.getOrDefault("password", "secret"),
          shortPageEndOfData = shortPage == "end_of_data")
      }
    EntityConf(e, rows, fields,
      params.get("category_mod").map(_.toInt).getOrElse(5), updateEvery,
      remote)
  }

  /** Position → record id under the changelog mapping (identity when
    * updates are off). */
  def recordId(p: Long, updateEvery: Int): Long =
    if (updateEvery < 2) p
    else {
      val newIdx = p - p / updateEvery
      if (p % updateEvery == updateEvery - 1) newIdx / 2 else newIdx
    }

  /** Position → record version: 1 on update positions, else 0. */
  def recordVer(p: Long, updateEvery: Int): Int =
    if (updateEvery >= 2 && p % updateEvery == updateEvery - 1) 1 else 0

  /** R12 fault injection — the knobs that make the deterministic "remote"
    * fail the way a real REST backend does, so the reference-exact retry
    * loop (fetchBatchWithRetry, ChargeOverSourceTask.java:296-343) runs on
    * the LIVE data path instead of only in unit-tested formula form:
    *
    *  - `failEveryNthPage=n`: the fetch of every page whose ordinal
    *    (startId / pageSize) is a multiple of n fails TRANSIENTLY on its
    *    first `failAttempts` attempts — recovered by the in-fetch
    *    exponential-backoff retries when failAttempts <= maxRetries;
    *  - `rateLimit=true`: those transient failures are HTTP-429-shaped
    *    (ChargeOverRateLimitException, ApiClient.java:169-171) — the retry
    *    waits the flat 60 s instead of the exponential curve;
    *  - `maxRetries`: the reference's max.retries (default 3,
    *    Config.java:69-73) — attempts = maxRetries + 1, then rethrow;
    *  - `retryBackoffScale`: scales the SLEEP only (tests use 1e-4); the
    *    computed backoff follows StateMachine.backoffMillis exactly;
    *  - `pollFailAt=pos:k[,pos:k…]`: the poll whose fetch starts at
    *    absolute position `pos` EXHAUSTS all in-fetch retries on its first
    *    k polls (handleFetchError, Task.java:349-366) — the offset log
    *    records retry_count climbing, and past 10 consecutive failures the
    *    open batch resets (Task.java:356-361), re-serving the window from
    *    its start: the reference's documented at-least-once duplication.
    *
    * Jitter is derived from (pageStart, attempt) via splitmix64 so every
    * run — and every Spark task RETRY of the same page — replays the same
    * backoff schedule. */
  final case class FaultPlan(failEveryNthPage: Int, failAttempts: Int,
      rateLimit: Boolean, maxRetries: Int, backoffScale: Double,
      pollFailAt: Map[Long, Int]) {
    def pageFault(startId: Long, pageSize: Int): PageFault =
      if (failEveryNthPage > 0 && (startId / pageSize) % failEveryNthPage == 0)
        PageFault(failAttempts, rateLimit, maxRetries, backoffScale)
      else PageFault(0, rateLimited = false, maxRetries, backoffScale)
  }
  object FaultPlan {
    val none: FaultPlan = FaultPlan(0, 0, rateLimit = false, 3, 1.0, Map.empty)
  }

  /** The planner's verdict for ONE page: how many fetch attempts fail
    * before the page loads. Computed at planning time so the executor-side
    * reader stays a pure retry loop. */
  final case class PageFault(failAttempts: Int, rateLimited: Boolean,
      maxRetries: Int, backoffScale: Double)
  object PageFault {
    val none: PageFault = PageFault(0, rateLimited = false, 3, 1.0)
  }

  private[sources] def faultPlan(props: util.Map[String, String]): FaultPlan = {
    val n = props.getOrDefault("failEveryNthPage", "0").toInt
    val attempts = props.getOrDefault("failAttempts", "2").toInt
    val rate = props.getOrDefault("rateLimit", "false").toBoolean
    val maxRetries = props.getOrDefault("maxRetries", "3").toInt
    val scale = props.getOrDefault("retryBackoffScale", "1.0").toDouble
    if (n < 0 || attempts < 0 || maxRetries < 0)
      throw new IllegalArgumentException(
        s"failEveryNthPage/failAttempts/maxRetries must be >= 0")
    if (!(scale > 0.0))
      throw new IllegalArgumentException(s"retryBackoffScale must be > 0, got $scale")
    val pollFailAt = props.getOrDefault("pollFailAt", "").split(",")
      .map(_.trim).filter(_.nonEmpty).map(_.split(":", 2) match {
        case Array(p, k) => p.trim.toLong -> k.trim.toInt
        case other => throw new IllegalArgumentException(
          s"pollFailAt entries must be pos:count, got '${other.mkString(":")}'")
      }).toMap
    if (pollFailAt.exists(_._2 < 0))
      throw new IllegalArgumentException("pollFailAt counts must be >= 0")
    FaultPlan(n, attempts, rate, maxRetries, scale, pollFailAt)
  }

  /** splitmix64 → [0,1): the deterministic stand-in for the reference's
    * Math.random() jitter sample (Task.java:333). */
  private[graft] def jitterUnit(pageStart: Long, attempt: Int): Double = {
    var z = pageStart * 0x9E3779B97F4A7C15L + attempt * 0xC2B2AE3D27D4EB4FL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble
  }

  def tsOf(id: Long): Long = BaseUs + id * StepUs
  def idOfTsCeil(tsUs: Long): Long = // first id with ts >= tsUs
    if (tsUs <= BaseUs) 0L else (tsUs - BaseUs + StepUs - 1) / StepUs
  def idOfTsExclUpper(tsUs: Long): Long = // first id with ts >= upper bound
    if (tsUs <= BaseUs) 0L else (tsUs - BaseUs + StepUs - 1) / StepUs
}

class PagedEntityTable(confs: Seq[PagedEntitySource.EntityConf], pageSize: Int,
    multi: Boolean, windowRows: Long = 0L,
    faults: PagedEntitySource.FaultPlan = PagedEntitySource.FaultPlan.none)
    extends Table with SupportsRead {
  override def name(): String = s"paged_${confs.map(_.name).mkString("+")}"
  override def schema(): StructType =
    if (multi) PagedEntitySource.multiSchema else PagedEntitySource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(confs, pageSize, multi, windowRows, faults)
}

class PagedScanBuilder(confs: Seq[PagedEntitySource.EntityConf], pageSize: Int,
    multi: Boolean, windowRows: Long = 0L,
    faults: PagedEntitySource.FaultPlan = PagedEntitySource.FaultPlan.none)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownOffset with SupportsPushDownTopN {

  private var lo: Long = 0L          // first id to serve (inclusive)
  private var hi: Long = confs.map(_.rows).max // end id (exclusive)
  private var kept: Seq[PagedEntitySource.EntityConf] = confs
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType =
    if (multi) PagedEntitySource.multiSchema else PagedEntitySource.fullSchema

  /** R4: LIMIT lands in the page plan — `hi` caps so trailing pages are
    * never planned, the exact analog of stopping the pagination loop after
    * `limit` records. Fully pushed: the source emits at most `limit` rows.
    * Multi-entity: a global row cap across entity streams isn't a page
    * bound — declined, Spark applies it after the union. */
  override def pushLimit(limit: Int): Boolean = {
    if (kept.size > 1) return false
    hi = math.min(hi, math.min(lo, hi) + limit)
    true
  }
  override def isPartiallyPushed(): Boolean = false

  /** R4: OFFSET advances the serve cursor (`state.currentOffset`,
    * ChargeOverSourceTask.java:221-226) — leading pages are never planned. */
  override def pushOffset(offset: Int): Boolean = {
    if (kept.size > 1) return false
    lo = math.min(lo + offset, hi)
    true
  }

  /** True while every kept entity is in plain (id == position) mode — the
    * precondition for pushing id-keyed predicates/orderings into the page
    * plan. In changelog mode update positions re-emit EARLIER ids, so id
    * is neither dense nor ascending; only ts (linear in position in both
    * modes) stays pushable. */
  private def idIsPosition: Boolean = kept.forall(_.updateEvery < 2)

  /** R3+R4: ORDER BY id/ts ASC LIMIT n — the source's native order IS
    * id==ts ascending (one record per minute per id), so a TopN on either
    * column collapses to the same page-plan cap as a plain LIMIT. Any
    * other ordering is declined and evaluated by Spark. */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    val nativeOrder = orders.forall { o =>
      o.direction == SortDirection.ASCENDING && (o.expression match {
        case f: NamedReference => f.fieldNames.sameElements(Array("id")) && idIsPosition ||
          f.fieldNames.sameElements(Array("ts_us"))
        case _ => false
      })
    }
    // pushLimit declines in multi-entity mode (entities share the id
    // space, so the unioned stream is not globally id-ordered) — TopN
    // pushes only when the limit itself could
    nativeOrder && orders.nonEmpty && pushLimit(limit)
  }

  /** R2: accept range predicates on the ordered ts column (and id), narrow
    * the served id range — the moral equivalent of `where=ts:GTE:a,ts:LT:b`
    * in the request URL. Everything else stays a residual for Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      // GT/LTE compute v+1: at v == Long.MaxValue that overflows to
      // MinValue and would wrongly serve zero rows — DSv2 trusts accepted
      // filters, so leave the (vacuous GT / all-rows LTE) case residual.
      case GreaterThan("ts_us", v: Long) => v != Long.MaxValue
      case LessThanOrEqual("ts_us", v: Long) => v != Long.MaxValue
      case GreaterThanOrEqual("ts_us", _: Long) | LessThan("ts_us", _: Long) => true
      case GreaterThanOrEqual("id", _: Long) | LessThan("id", _: Long) => idIsPosition
      // R9 inverse: an entity predicate prunes whole entity streams at
      // planning time — the analog of not polling that entity at all
      case EqualTo("_entity_type", _: String) => multi
      case _ => false
    }
    ours.foreach {
      case GreaterThanOrEqual("ts_us", v: Long) =>
        lo = math.max(lo, PagedEntitySource.idOfTsCeil(v))
      case GreaterThan("ts_us", v: Long) =>
        lo = math.max(lo, PagedEntitySource.idOfTsCeil(v + 1))
      case LessThan("ts_us", v: Long) =>
        hi = math.min(hi, PagedEntitySource.idOfTsExclUpper(v))
      case LessThanOrEqual("ts_us", v: Long) =>
        hi = math.min(hi, PagedEntitySource.idOfTsExclUpper(v + 1))
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case EqualTo("_entity_type", v: String) => kept = kept.filter(_.name == v)
      case _ =>
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  /** R5: `fields=` — serve only the requested columns. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new PagedScan(math.min(lo, hi), hi, pageSize, required, kept, windowRows,
      multi, faults)
}

/** R4: the planner turns the (narrowed) id range into pages — out-of-window
  * pages simply never exist. Multi-entity: pages are planned per entity
  * (entity-level parallelism, the partitioned-source reading of R15). */
class PagedScan(lo: Long, hi: Long, pageSize: Int, required: StructType,
    confs: Seq[PagedEntitySource.EntityConf], windowRows: Long = 0L,
    multi: Boolean = false,
    faults: PagedEntitySource.FaultPlan = PagedEntitySource.FaultPlan.none)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  /** The stream flavor follows the table MODE, not the entity count: an
    * `entities=` table always uses per-entity map offsets, so a config
    * that later adds entities restarts cleanly from the same checkpoint
    * (a count-based choice would flip the offset JSON format). */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    if (multi)
      new PagedMultiMicroBatchStream(confs, pageSize, windowRows, required, faults)
    else
      new PagedMicroBatchStream(confs.head, pageSize,
        if (windowRows > 0) windowRows else confs.head.rows, required, faults)
  override def description(): String = {
    val ent = if (confs.size == 1) "" else s", entities=${confs.map(_.name).mkString("+")}"
    s"PagedScan(lo=$lo, hi=$hi, pageSize=$pageSize, fields=${required.fieldNames.mkString(",")}$ent)"
  }

  override def planInputPartitions(): Array[InputPartition] =
    confs.toArray.flatMap { conf =>
      val eLo = math.min(lo, conf.rows)
      val eHi = math.min(hi, conf.rows)
      val n = math.max(0L, eHi - eLo)
      val pages = ((n + pageSize - 1) / pageSize).toInt
      (0 until pages).map { p =>
        val start = eLo + p.toLong * pageSize
        PagedPartition(start, math.min(eHi, start + pageSize), conf,
          faults.pageFault(start, pageSize), eLo, eHi): InputPartition
      }
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required)
}

/** One planned API page. `windowLoId`/`windowHiId` carry the enclosing
  * scan (or stream) window so an HTTP fetch can reproduce the reference's
  * request shape exactly: `where=` holds the WINDOW and `offset=` the
  * page's position within it (fetchChangesWithPagination pages a fixed
  * where-window by offset, ChargeOverApiClient.java:86-112). */
case class PagedPartition(startId: Long, endId: Long,
  conf: PagedEntitySource.EntityConf,
  fault: PagedEntitySource.PageFault = PagedEntitySource.PageFault.none,
  windowLoId: Long = -1L, windowHiId: Long = -1L)
  extends InputPartition {
  def winLo: Long = if (windowLoId >= 0) windowLoId else startId
  def winHi: Long = if (windowHiId >= 0) windowHiId else endId
}

class PagedReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PagedPartitionReader(partition.asInstanceOf[PagedPartition], required)
}

/** Page-fetch failure — IOException-shaped like the reference's
  * (ApiClient.java:173-175); the 429 flavor mirrors
  * ChargeOverRateLimitException (ApiClient.java:169-171). `permanent`
  * marks deterministic CONTRACT violations (long page, strict-mode short
  * page, out-of-span ts, malformed envelope) that retrying cannot heal:
  * the retry loop rethrows those immediately instead of burning
  * maxRetries+1 backoff cycles on a backend that will answer the same
  * wrong thing every time. */
class PagedFetchException(msg: String, val rateLimited: Boolean,
    val permanent: Boolean = false)
  extends java.io.IOException(msg)

/** One page fetch (ChargeOverApiClient.fetchChangesWithPagination analog):
  * deterministic record generator in place of the HTTP GET. Per-entity
  * `fields=` means unrequested data columns come back null (a schemaless
  * record that lacks the field); `category_mod` stands in for an arbitrary
  * extra query param the remote honors.
  *
  * The fetch runs under the reference-exact retry loop
  * (fetchBatchWithRetry, ChargeOverSourceTask.java:296-343): up to
  * maxRetries+1 attempts, exponential backoff `min(2^attempt·1s + 0-10%
  * jitter, 30s)` between general failures, a flat 60 s after a 429, and a
  * rethrow once attempts are exhausted — at which point Spark's own task
  * retry (`spark.task.maxFailures`) is the outer loop the Connect
  * framework's next poll() provides in the reference. Backoff values come
  * from StateMachine.backoffMillis (the PropertySpec'd formula); only the
  * SLEEP is scaled by retryBackoffScale so specs drain in milliseconds. */
class PagedPartitionReader(page: PagedPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private var id = page.startId - 1
  private val fields = required.fieldNames
  private val conf = page.conf
  private var fetched = false
  // HTTP mode: the fetched page, already mapped to rows
  private var httpRows: Iterator[InternalRow] = Iterator.empty
  private var cur: InternalRow = null
  private def served(f: String): Boolean = conf.fields.forall(_.contains(f))

  /** One fetch ATTEMPT. Generator mode: a no-op, except the planned fault
    * fails the first `failAttempts` attempts. HTTP mode: a real GET in the
    * reference's request grammar — the server's own status codes (429 /
    * 5xx) raise the same two failure flavors the fault plan simulates, so
    * the retry loop below is identical either way. */
  private def attemptFetch(attempt: Int): Unit = conf.remote match {
    case None =>
      if (attempt < page.fault.failAttempts)
        throw new PagedFetchException(
          s"simulated ${if (page.fault.rateLimited) "429 rate limit" else "fetch failure"} " +
          s"for page@${page.startId} attempt ${attempt + 1}", page.fault.rateLimited)
    case Some(api) =>
      httpRows = HttpPageFetch.fetch(api, page, required).iterator
  }

  /** fetchBatchWithRetry (ChargeOverSourceTask.java:296-343): up to
    * maxRetries+1 attempts, exponential backoff between general failures,
    * flat 60 s after a 429, rethrow once exhausted. Runs once, lazily, so
    * a zero-row page costs nothing. */
  private def fetchWithRetry(): Unit = {
    val f = page.fault
    var attempt = 0
    var lastEx: Exception = null
    while (!fetched && attempt <= f.maxRetries) {
      try { attemptFetch(attempt); fetched = true }
      catch {
        case e: PagedFetchException if e.permanent =>
          // a contract violation, not a transient fault — the backend will
          // serve the same wrong answer on every attempt; fail the task
          // now instead of maxRetries+1 backoff cycles from here and then
          // again from every Spark task retry
          throw e
        case e: PagedFetchException =>
          lastEx = e
          if (attempt < f.maxRetries) {
            val backoff = graft.engine.StateMachine.backoffMillis(attempt,
              e.rateLimited, PagedEntitySource.jitterUnit(page.startId, attempt))
            Thread.sleep(math.max(0L, (backoff * f.backoffScale).toLong))
          }
          attempt += 1
      }
    }
    if (!fetched)
      throw new java.io.IOException(
        s"Failed after ${f.maxRetries + 1} attempts", lastEx)
  }

  override def next(): Boolean = {
    if (!fetched) fetchWithRetry()
    if (conf.remote.isDefined) {
      if (httpRows.hasNext) { cur = httpRows.next(); true } else false
    } else { id += 1; id < page.endId }
  }

  override def get(): InternalRow = if (conf.remote.isDefined) cur else {
    // `id` here is the stream POSITION; the record id diverges from it
    // only in changelog mode (update positions re-emit an earlier id)
    val rid = PagedEntitySource.recordId(id, conf.updateEvery)
    val ver = PagedEntitySource.recordVer(id, conf.updateEvery)
    val vals: Array[Any] = fields.map {
      case "_entity_type" => UTF8String.fromString(conf.name)
      case "id" => java.lang.Long.valueOf(rid)
      case f if !served(f) => null
      case "ts_us" => java.lang.Long.valueOf(PagedEntitySource.tsOf(id))
      case "value" =>
        java.lang.Double.valueOf(((rid * 7919 + ver * 1000003L) % 100000) / 100.0)
      case "category" => UTF8String.fromString(s"cat${rid % conf.categoryMod}")
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = ()
}

/** The real page fetch (fetchChangesWithPagination,
  * ChargeOverApiClient.java:80-183), JDK HttpURLConnection + the Jackson
  * already on Spark's classpath — zero new dependencies. The request
  * reproduces the reference's grammar with the generator's id↔ts mapping:
  * `where=` holds the window as half-open ts bounds (GTE/LT, :95-112 —
  * our values are integer micros, so the reference's datetime
  * colon-escaping has nothing to escape), `order=ts_us:ASC` (:117),
  * `limit`/`offset` page within the window (:89-90), `fields=` carries
  * the server-side projection and `category_mod`/`update_every` the extra
  * query params (additionalQueryParams, :119-123). Responses: 200 →
  * unwrap `{"response":[…]}` (:149-158); 429 → the rate-limited failure
  * flavor (:169-171); anything else, including connect/read errors →
  * the transient flavor (:171-175). Failures raise [[PagedFetchException]]
  * for the caller's reference-exact retry loop. */
private[sources] object HttpPageFetch {
  /** One mapper for the life of the executor, like the reference's
    * per-client cached instance (ChargeOverApiClient.java holds a single
    * ObjectMapper) — `readTree` is thread-safe, and per-page construction
    * repeats Jackson's module/introspector warmup on every fetch. Shared
    * with the offset-JSON codecs below for the same reason. */
  private[sources] val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def fetch(api: PagedEntitySource.RemoteApi, page: PagedPartition,
      required: StructType): Array[InternalRow] = {
    val conf = page.conf
    val qs = new StringBuilder()
    qs.append("limit=").append(page.endId - page.startId)
    qs.append("&offset=").append(page.startId - page.winLo)
    qs.append("&where=ts_us:GTE:").append(PagedEntitySource.tsOf(page.winLo))
      .append(",ts_us:LT:").append(PagedEntitySource.tsOf(page.winHi))
    qs.append("&order=ts_us:ASC")
    conf.fields.foreach(fs =>
      qs.append("&fields=").append(fs.toSeq.sorted.mkString(",")))
    qs.append("&category_mod=").append(conf.categoryMod)
    if (conf.updateEvery >= 2) qs.append("&update_every=").append(conf.updateEvery)
    val url = s"${api.endpoint}/${conf.name}?${qs.toString}"
    val c = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      c.setConnectTimeout(5000)
      c.setReadTimeout(15000)
      c.setRequestMethod("GET")
      c.setRequestProperty("Authorization", "Basic " +
        java.util.Base64.getEncoder.encodeToString(
          s"${api.username}:${api.password}".getBytes("UTF-8")))
      c.setRequestProperty("Content-Type", "application/json")
      val code =
        try c.getResponseCode
        catch {
          case e: java.io.IOException => throw new PagedFetchException(
            s"connect/read failed for page@${page.startId}: ${e.getMessage}",
            rateLimited = false)
        }
      if (code == 429)
        throw new PagedFetchException(
          s"429 rate limit for page@${page.startId}", rateLimited = true)
      if (code != 200)
        throw new PagedFetchException(
          s"HTTP $code for page@${page.startId}", rateLimited = false)
      // the 200-path body read and parse fail transiently too (read
      // timeout mid-body, connection reset after the status line, a proxy
      // error page instead of the envelope) — wrap them into the same
      // transient flavor the reference's catch-all gives every fetch
      // error (ChargeOverApiClient.java:171-175), so the retry loop owns
      // them instead of the task dying on the first mid-body hiccup
      val resp =
        try mapper.readTree(
          new String(c.getInputStream.readAllBytes(), "UTF-8")).get("response")
        catch {
          case e: java.io.IOException => throw new PagedFetchException(
            s"body read/parse failed for page@${page.startId}: ${e.getMessage}",
            rateLimited = false)
        }
      if (resp == null || !resp.isArray)
        throw new PagedFetchException(
          s"malformed envelope (no response array) from ${api.endpoint}/${conf.name}",
          rateLimited = false, permanent = true)
      // a backend serving a different extent than the planned scan would
      // otherwise yield silent duplicates (long page) or silent data loss
      // (short page / out-of-window rows) relative to the pushdown plan —
      // validate the envelope against the page contract. Violations are
      // PERMANENT: the backend answers the same wrong extent every time,
      // so retry/backoff cannot heal them
      val expect = page.endId - page.startId
      if (resp.size() > expect)
        throw new PagedFetchException(
          s"server returned ${resp.size()} rows for page@${page.startId}, " +
            s"limit was $expect", rateLimited = false, permanent = true)
      // a SHORT page is ambiguous: under the reference's REST contract it
      // is the ordinary end-of-data signal (hasMore = fetched == limit,
      // ChargeOverApiClient.java:164-165); under the dense-id fixture it
      // means the backend truncated the planned window. The shortPage
      // option picks the reading — strict (default) fails fast,
      // end_of_data emits what was served and lets pagination end there
      if (resp.size() < expect && !api.shortPageEndOfData)
        throw new PagedFetchException(
          s"short page@${page.startId}: got ${resp.size()} rows, expected " +
            s"$expect — backend truncated the planned window " +
            "(set shortPage=end_of_data if the backend is legitimately sparse)",
          rateLimited = false, permanent = true)
      val tsLo = PagedEntitySource.tsOf(page.startId)
      val tsHi = PagedEntitySource.tsOf(page.endId)
      val fields = required.fieldNames
      Array.tabulate(resp.size()) { i =>
        val rec = resp.get(i)
        // ts maps 1:1 to the stream position, so a served ts outside the
        // planned page's half-open span means the backend answered a
        // different window than the one pushed down — duplicated or
        // displaced rows if emitted verbatim
        val ts = rec.get("ts_us")
        if (ts != null && !ts.isNull &&
            (ts.asLong() < tsLo || ts.asLong() >= tsHi))
          throw new PagedFetchException(
            s"row $i of page@${page.startId} has ts_us=${ts.asLong()} " +
              s"outside the planned span [$tsLo, $tsHi)",
            rateLimited = false, permanent = true)
        val vals: Array[Any] = fields.map {
          case "_entity_type" => UTF8String.fromString(conf.name)
          case f =>
            val n = rec.get(f)
            if (n == null || n.isNull) null
            else f match {
              case "id" | "ts_us" => java.lang.Long.valueOf(n.asLong())
              case "value" => java.lang.Double.valueOf(n.asDouble())
              case _ => UTF8String.fromString(n.asText())
            }
        }
        new GenericInternalRow(vals): InternalRow
      }
    } finally c.disconnect()
  }
}

/** The stream position, mirroring the reference's 7-field per-entity
  * offset map FIELD FOR FIELD (ChargeOverSourceTask.java:409-416 — the
  * map piggybacked on every emitted SourceRecord and restored via
  * offsetStorageReader on restart, :98-133), transposed from the
  * datetime-string domain to the generator's id domain (id == minutes
  * since origin, so id bounds ARE time bounds):
  *
  *  - `load_mode`              "INITIAL_LOAD" | "INCREMENTAL_LOAD" (:28-31)
  *  - `last_processed_id`      analog of last_processed_datetime — the
  *                             committed low watermark (exclusive start
  *                             of the open window)
  *  - `batch_end_id`           analog of batch_end_datetime — the "now"
  *                             captured when the window opened (:245-262)
  *  - `current_offset`         rows already served WITHIN the window —
  *                             the pagination cursor (:221-226)
  *  - `is_processing_batch`    window open and partially consumed
  *  - `retry_count`            consecutive polls whose page fetch
  *                             EXHAUSTED its in-fetch retries
  *                             (handleFetchError, :349-366) — 0 on any
  *                             successful poll; climbs only while the
  *                             fault plan keeps a page down
  *  - `next_scheduled_run`     0 while windows open immediately; a batch
  *                             reset after >10 consecutive failures
  *                             (:356-361) reschedules the entity to
  *                             `last_processed_id + 1440` — the
  *                             reference's +24 h fallback transposed to
  *                             the id==minutes domain (cron arithmetic
  *                             itself lives in graft.engine.Cron)
  *
  * Absolute stream position = last_processed_id + current_offset,
  * monotone across offsets except the documented batch-reset regression —
  * the reference's at-least-once window replay. */
case class PagedStreamOffset(loadMode: String, lastProcessedId: Long,
    batchEndId: Long, currentOffset: Long, isProcessingBatch: Boolean,
    retryCount: Int = 0, nextScheduledRunId: Long = 0L)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  def pos: Long = lastProcessedId + currentOffset
  override def json(): String =
    s"""{"load_mode":"$loadMode","last_processed_id":$lastProcessedId,""" +
    s""""batch_end_id":$batchEndId,"current_offset":$currentOffset,""" +
    s""""is_processing_batch":$isProcessingBatch,"retry_count":$retryCount,""" +
    s""""next_scheduled_run":$nextScheduledRunId}"""
}

object PagedStreamOffset {
  val Initial: PagedStreamOffset =
    PagedStreamOffset("INITIAL_LOAD", 0L, 0L, 0L, isProcessingBatch = false)

  def fromJson(json: String): PagedStreamOffset = {
    val m = HttpPageFetch.mapper.readTree(json)
    PagedStreamOffset(
      m.get("load_mode").asText(),
      m.get("last_processed_id").asLong(),
      m.get("batch_end_id").asLong(),
      m.get("current_offset").asLong(),
      m.get("is_processing_batch").asBoolean(),
      m.get("retry_count").asInt(),
      m.get("next_scheduled_run").asLong())
  }
}

/** The reference's CONTINUOUS identity — a polling CDC source
  * (ChargeOverSourceTask.java:136-173 poll loop) — as a genuine DSv2
  * `MicroBatchStream`:
  *
  *  - one `poll()` == one micro-batch, returning at most one PAGE
  *    (`getDefaultReadLimit = maxRows(pageSize)` — batch.size, the
  *    reference's per-poll fetch bound);
  *  - the incremental window state machine (INITIAL_LOAD catch-up, then
  *    windowed INCREMENTAL_LOAD, :245-291) drives `latestOffset`: a
  *    window [last, batchEnd) opens, pages through, completes, and the
  *    mode switches exactly once after the first window completes;
  *  - offsets are committed by Spark's checkpoint offset log — the exact
  *    role the per-record sourceOffset map plays for Connect (:434-443);
  *    restart resumes from the committed (window, page) position with no
  *    re-emission;
  *  - `SupportsTriggerAvailableNow` caps a run at the data available
  *    when the trigger fired (the captured "now" of :245-262) and drains
  *    page-by-page to it.
  *
  * At scale the page-per-trigger admission bound is the backpressure
  * control (maxOffsetsPerTrigger's role); each micro-batch plans its
  * pages as parallel InputPartitions exactly like the batch path. */
class PagedMicroBatchStream(conf: PagedEntitySource.EntityConf, pageSize: Int,
    windowRows: Long, required: StructType,
    faults: PagedEntitySource.FaultPlan = PagedEntitySource.FaultPlan.none)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit, ReadMaxRows}

  /** Rows visible to the stream — the static generator's full extent.
    * A live backend would re-sample this per trigger ("now"). */
  private def available: Long = conf.rows
  @volatile private var availableNowTarget: Long = -1L
  private def target: Long =
    if (availableNowTarget >= 0) availableNowTarget else available

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = available

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(pageSize)

  override def initialOffset(): SOffset = PagedStreamOffset.Initial

  override def latestOffset(): SOffset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  /** Poll-failure budget still in force. A batch reset CONSUMES the entry
    * for the position that caused it: a real transient outage ends, so the
    * replayed window must eventually pass — keeping the entry would re-fail
    * the same page forever (an injected permanent outage, which is what
    * `failAttempts > maxRetries` is for). Driver-local by design: a driver
    * restart re-arms the plan, which only adds zero-progress batches —
    * committed rows stay exactly-once. */
  @volatile private var activeFails: Map[Long, Int] = faults.pollFailAt

  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val maxRows = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => Long.MaxValue
    }
    val s = start.asInstanceOf[PagedStreamOffset]
    val out = PagedMicroBatchStream.step(s, target, windowRows, maxRows,
      activeFails)
    if (out.nextScheduledRunId > 0L && s.nextScheduledRunId == 0L)
      activeFails -= s.pos // the reset retired this outage
    out
  }

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] =
    PagedMicroBatchStream.pagesBetween(
      start.asInstanceOf[PagedStreamOffset],
      end.asInstanceOf[PagedStreamOffset], pageSize, conf, faults).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required)

  override def deserializeOffset(json: String): SOffset =
    PagedStreamOffset.fromJson(json)

  override def commit(end: SOffset): Unit = () // offset log is the durability
  override def stop(): Unit = ()
}

object PagedMicroBatchStream {
  /** The reference's +24 h failure fallback (Task.java:386-388) in the
    * id==minutes domain: 1440 ids = one day of records. */
  val FallbackRows: Long = 1440L

  /** One `poll()` step of the reference's per-entity state machine
    * (ChargeOverSourceTask.java:195-291) in the id domain: serve up to
    * `maxRows` of the open window — opening a new window
    * [pos, pos + windowRows) capped at `target` if none is open — and on
    * window completion reset the cursor and switch the mode (a switch
    * that only has an effect once: INITIAL_LOAD→INCREMENTAL_LOAD).
    * Returns `s` UNCHANGED (reference equality) when caught up — the
    * poll-returns-null case (:146-147) that ends an AvailableNow drain.
    *
    * `pollFailAt(pos) = k` injects the reference's POLL-level failure
    * (handleFetchError, :349-366): the first k polls fetching the page at
    * `pos` exhaust their in-fetch retries — each advances nothing and
    * increments `retry_count`; a successful poll resets it to 0. Past 10
    * consecutive failures the open batch RESETS (:356-361): the cursor
    * regresses to last_processed and the entity is rescheduled +1440 ids
    * (the +24 h fallback, :386-388) — when data growth passes that mark,
    * the window reopens from its start and re-serves rows already
    * emitted, which is exactly the reference's documented at-least-once
    * duplication (SURVEY §2a quirks), repaired downstream by
    * dedup/dropDuplicatesWithinWatermark.
    *
    * A restored in-flight window is clamped to `target`: a restart
    * configured with fewer rows than the checkpointed batch_end_id must
    * not serve ids past the configured extent. */
  def step(s: PagedStreamOffset, target: Long, windowRows: Long,
      maxRows: Long, pollFailAt: Map[Long, Int] = Map.empty): PagedStreamOffset = {
    val pos = s.pos
    if (pos >= target) return s
    // readiness gate after a batch reset: "now" in the id domain is the
    // data's extent — the entity stays parked until growth passes the
    // rescheduled mark (isReady, Task.java:178-190)
    if (!s.isProcessingBatch && target < s.nextScheduledRunId) return s
    val wEnd =
      if (s.isProcessingBatch) math.min(s.batchEndId, target)
      else math.min(pos + windowRows, target)
    if (pollFailAt.getOrElse(pos, 0) > s.retryCount) {
      // this poll's fetch exhausted all in-fetch retries: keep the window
      // open at the same cursor, count the failure (Task.java:349-355)
      val rc = s.retryCount + 1
      if (rc > 10) // too many consecutive failures → reset the batch
        PagedStreamOffset(s.loadMode, s.lastProcessedId, 0L, 0L,
          isProcessingBatch = false, retryCount = 0,
          nextScheduledRunId = s.lastProcessedId + FallbackRows)
      else
        PagedStreamOffset(s.loadMode, s.lastProcessedId, wEnd,
          pos - s.lastProcessedId, isProcessingBatch = true, retryCount = rc)
    } else {
      // admit = min(maxRows, remaining): computed WITHOUT pos + maxRows —
      // ReadLimit.allAvailable (Trigger.Once forces it regardless of the
      // default limit) arrives as Long.MaxValue and a naive pos + maxRows
      // wraps negative, regressing the committed position
      val admit = math.min(math.max(maxRows, 1L), wEnd - pos)
      val newPos = pos + admit
      if (newPos >= wEnd)
        PagedStreamOffset("INCREMENTAL_LOAD", wEnd, wEnd, 0L,
          isProcessingBatch = false)
      else
        PagedStreamOffset(s.loadMode, s.lastProcessedId, wEnd,
          newPos - s.lastProcessedId, isProcessingBatch = true)
    }
  }

  /** Pages [start.pos, end.pos) as InputPartitions for one entity. The
    * partitions carry the OPEN WINDOW's bounds, not the page's — an HTTP
    * fetch then reproduces the reference's poll request exactly: `where=`
    * holds [last_processed, batch_end) and `offset=` the cursor within it
    * (ChargeOverSourceTask.java:221-226 paging a fixed window). On window
    * completion the end offset's batch_end_id still names the window just
    * closed, so the bounds stay correct for the final page too. */
  private[sources] def pagesBetween(start: PagedStreamOffset,
      end: PagedStreamOffset, pageSize: Int,
      conf: PagedEntitySource.EntityConf,
      faults: PagedEntitySource.FaultPlan = PagedEntitySource.FaultPlan.none):
      Seq[InputPartition] = {
    val spos = start.pos
    val epos = end.pos
    val winLo = start.lastProcessedId
    // batch-reset offsets regress with batch_end_id = 0; any actual page
    // range is bounded by end.pos, so clamp the window around it
    val winHi = math.max(end.batchEndId, epos)
    val n = math.max(0L, epos - spos)
    val pages = ((n + pageSize - 1) / pageSize).toInt
    (0 until pages).map { p =>
      val pStart = spos + p.toLong * pageSize
      PagedPartition(pStart, math.min(epos, pStart + pageSize), conf,
        faults.pageFault(pStart, pageSize), winLo, winHi): InputPartition
    }
  }
}

/** Multi-entity stream position: one [[PagedStreamOffset]] per entity —
  * the reference's `Map<String, EntityState>` (one independent state
  * machine per configured entity, ChargeOverSourceTask.java:84-90),
  * serialized with entity keys sorted so the JSON is deterministic.
  * Interpolating names unescaped is safe because table resolution rejects
  * anything outside [A-Za-z0-9_-] (entityConf). */
case class MultiPagedStreamOffset(entities: Map[String, PagedStreamOffset])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    entities.toSeq.sortBy(_._1).map { case (e, o) =>
      s""""$e":${o.json()}"""
    }.mkString("""{"entities":{""", ",", "}}")
}

object MultiPagedStreamOffset {
  def fromJson(json: String): MultiPagedStreamOffset = {
    val root = HttpPageFetch.mapper.readTree(json)
    val ents = root.get("entities")
    val b = Map.newBuilder[String, PagedStreamOffset]
    val it = ents.fields()
    while (it.hasNext) {
      val f = it.next()
      b += f.getKey -> PagedStreamOffset.fromJson(f.getValue.toString)
    }
    MultiPagedStreamOffset(b.result())
  }
}

/** Multi-entity micro-batch stream: every `poll()` advances EACH entity
  * by up to one page of its own open window — the reference's poll loop
  * iterating the configured entity list, each with an independent state
  * machine and its own per-entity query params
  * (ChargeOverSourceTask.java:151-172; config per entity
  * Config.java:279-289). Pages of different entities plan as parallel
  * InputPartitions in the same micro-batch (entity-level parallelism —
  * the partitioned-source reading of R15 that the reference could not
  * do with tasks.max=1). The admission bound is per entity, matching
  * the reference's per-entity fetch of batch.size records per poll. */
class PagedMultiMicroBatchStream(confs: Seq[PagedEntitySource.EntityConf],
    pageSize: Int, windowRows: Long, required: StructType,
    faults: PagedEntitySource.FaultPlan = PagedEntitySource.FaultPlan.none)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit, ReadMaxRows}

  private def availableOf(c: PagedEntitySource.EntityConf): Long = c.rows
  @volatile private var availableNowTargets: Map[String, Long] = null
  private def targetOf(c: PagedEntitySource.EntityConf): Long =
    if (availableNowTargets != null) availableNowTargets(c.name)
    else availableOf(c)
  private def winOf(c: PagedEntitySource.EntityConf): Long =
    if (windowRows > 0) windowRows else c.rows

  /** Per-position poll-failure budget; consumed on batch reset exactly
    * like the single-entity stream (shared across entities: positions are
    * the failure key). */
  @volatile private var activeFails: Map[Long, Int] = faults.pollFailAt

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTargets = confs.map(c => c.name -> availableOf(c)).toMap

  /** The ReadLimit contract is PER BATCH, so the declared bound is the sum
    * of per-entity pages: one poll advances each entity by at most one
    * page (the reference fetches batch.size records per entity per poll,
    * Task.java:151-172), and the admission split below keeps the total
    * inside whatever limit Spark hands back. */
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(pageSize.toLong * confs.size)

  override def initialOffset(): SOffset =
    MultiPagedStreamOffset(
      confs.map(c => c.name -> PagedStreamOffset.Initial).toMap)

  override def latestOffset(): SOffset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val s = start.asInstanceOf[MultiPagedStreamOffset]
    val maxRows = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => Long.MaxValue
    }
    // split the per-batch admission bound evenly across entities so
    // entities × perEntity never exceeds the declared/requested limit
    val perEntity =
      if (maxRows == Long.MaxValue) Long.MaxValue
      else math.max(1L, maxRows / confs.size)
    val stepped = confs.map { c =>
      // an entity ADDED to the config after the checkpoint was written has
      // no restored state — it starts from INITIAL_LOAD, exactly the
      // reference's per-entity state init for an unseen entity
      // (loadEntityState default, ChargeOverSourceTask.java:98-133)
      val prev = s.entities.getOrElse(c.name, PagedStreamOffset.Initial)
      val out = PagedMicroBatchStream.step(prev, targetOf(c), winOf(c),
        perEntity, activeFails)
      if (out.nextScheduledRunId > 0L && prev.nextScheduledRunId == 0L)
        activeFails -= prev.pos // see the single-entity stream's note
      c.name -> out
    }.toMap
    if (confs.forall(c =>
        s.entities.get(c.name).exists(stepped(c.name) eq _))) s
    else MultiPagedStreamOffset(stepped)
  }

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val sm = start.asInstanceOf[MultiPagedStreamOffset].entities
    val em = end.asInstanceOf[MultiPagedStreamOffset].entities
    confs.flatMap { c =>
      val s = sm.getOrElse(c.name, PagedStreamOffset.Initial)
      val e = em.getOrElse(c.name, PagedStreamOffset.Initial)
      PagedMicroBatchStream.pagesBetween(s, e, pageSize, c, faults)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required)

  override def deserializeOffset(json: String): SOffset =
    MultiPagedStreamOffset.fromJson(json)

  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
}
