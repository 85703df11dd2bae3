package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed batch-at-a-time with `mapPartitions` (the Scala
  * analog of `mapInPandas` batching — one decoder instantiation per
  * partition, amortized across rows, never per row).
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * container): `decodeStub` derives deterministic fake dimensions from the
  * payload. Everything around it — the binary column, the typed metadata
  * schema, the partition-wise batching, the pushdown-friendly projection —
  * is the real 100 TB plumbing: payload bytes stay off the shuffle paths
  * (metadata is extracted before any wide op), and the decode is a narrow
  * map that scales linearly with executors.
  */
object Multimodal {

  /** A media row: id + raw bytes + format tag. */
  case class MediaRecord(doc_id: Long, fmt: String, payload: Array[Byte])

  /** Extracted metadata (what a real decoder would return). */
  case class MediaMeta(doc_id: Long, fmt: String, n_bytes: Long,
    width: Long, height: Long, frames: Long)

  /** STUB decoder — deterministic fake in place of a real codec.
    * A real implementation would parse the container header here. */
  private def decodeStub(r: MediaRecord): MediaMeta = MediaMeta(
    doc_id = r.doc_id,
    fmt = r.fmt,
    n_bytes = r.payload.length.toLong,
    width = 32L + (r.doc_id % 640L),
    height = 32L + (r.payload.length.toLong % 480L),
    frames = 1L + (r.doc_id % 8L))

  /** q_multimodal_meta: documents.text reinterpreted as a binary payload
    * (UTF-8 bytes), run through the partition-batched decode. The oracle
    * can replay the stub's arithmetic, which proves the plumbing (schema,
    * batching, byte counts) end-to-end. */
  def qMultimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), lit("img").as("fmt"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    // one decoder per partition; rows stream through in batches
    media.mapPartitions { it => it.map(decodeStub) }
      .toDF()
  }

  /** The stub's arithmetic replayed in SQL over the UTF-8 BYTE length
    * (octet_length of the encoded text — the engine's payload.length),
    * exact for non-ASCII text too. */
  val qMultimodalMetaSql: String =
    """SELECT doc_id, 'img' AS fmt,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(32 + doc_id % 640 AS BIGINT) AS width,
      |  CAST(32 + octet_length(encode(text)) % 480 AS BIGINT) AS height,
      |  CAST(1 + doc_id % 8 AS BIGINT) AS frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Resize result: source dims, target dims (fit a 224-box preserving
    * aspect), and the fake resized byte count (tw·th·3). */
  case class Resized(doc_id: Long, width: Long, height: Long,
    target_w: Long, target_h: Long, resized_bytes: Long)

  /** q_multimodal_resize: the resize step of an image pipeline — compute
    * the 224-box fit per image and emit the (stub) resized record. Narrow
    * map, binary never shuffles; the dimension arithmetic is replayed by
    * the SQL oracle (IEEE division is engine-identical). A real kernel
    * would transform payload bytes in the same mapPartitions slot. */
  def qMultimodalResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), lit("img").as("fmt"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    media.mapPartitions { it =>
      it.map { r =>
        val m = decodeStub(r)
        val scale = 224.0 / math.max(m.width, m.height)
        val tw = math.max(1L, math.floor(m.width * scale).toLong)
        val th = math.max(1L, math.floor(m.height * scale).toLong)
        Resized(m.doc_id, m.width, m.height, tw, th, tw * th * 3L)
      }
    }.toDF()
  }

  val qMultimodalResizeSql: String =
    """SELECT doc_id, width, height,
      |  GREATEST(1, CAST(FLOOR(width * (224.0 / GREATEST(width, height))) AS BIGINT)) AS target_w,
      |  GREATEST(1, CAST(FLOOR(height * (224.0 / GREATEST(width, height))) AS BIGINT)) AS target_h,
      |  GREATEST(1, CAST(FLOOR(width * (224.0 / GREATEST(width, height))) AS BIGINT)) *
      |    GREATEST(1, CAST(FLOOR(height * (224.0 / GREATEST(width, height))) AS BIGINT)) * 3 AS resized_bytes
      |FROM (
      |  SELECT doc_id,
      |    CAST(32 + doc_id % 640 AS BIGINT) AS width,
      |    CAST(32 + octet_length(encode(text)) % 480 AS BIGINT) AS height
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Per-row "embedding" from the encoder stub: an 8-bin byte-class
    * histogram — deterministic per row, independent of batching. Carries
    * the payload byte count alongside (real encoders emit metadata too;
    * it also lets the normalized histogram be de-normalized exactly). */
  case class Embedded(doc_id: Long, n_bytes: Long, embedding: Seq[Float])

  /** The batch-shaped encoder: groups the partition's rows into
    * fixed-size batches and "encodes" each batch in one call — the shape
    * a real model-inference UDF needs (weights load once per partition,
    * rows amortize into fixed-size tensor batches). Pure function over an
    * iterator so the batching contract is unit-testable without Spark. */
  private[graft] def encodeBatches(it: Iterator[MediaRecord], batchSize: Int):
      Iterator[Embedded] =
    it.grouped(batchSize).flatMap { batch =>
      // one "model call" per batch (here: a histogram per row)
      batch.map { r =>
        val h = new Array[Float](8)
        var i = 0
        while (i < r.payload.length) { h((r.payload(i) & 0xFF) >> 5) += 1f; i += 1 }
        val n = math.max(1, r.payload.length).toFloat
        Embedded(r.doc_id, r.payload.length.toLong, h.map(_ / n).toSeq)
      }
    }

  /** Typed embed pipeline: feature extraction over media payloads in
    * fixed-size batches (32). Output is per-row deterministic regardless
    * of partitioning; the float-vector contract is pinned by spec
    * (EnvelopeSpec batch-invariance + L1 normalization). */
  def qMultimodalEmbedTyped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), lit("img").as("fmt"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    media.mapPartitions(it => encodeBatches(it, 32))
      .toDF()
  }

  /** q_multimodal_embed, driver-comparable rendering: the comparison
    * harness cannot sort an array<float> column, so the registered query
    * de-normalizes the histogram back to its exact integer bin counts
    * (round(h·n) — float32 error « 0.5 at these lengths) and renders them
    * as one comma-joined string. The DuckDB oracle recomputes the byte
    * histogram per document (text is ASCII, so codepoint == byte), which
    * verifies the whole encode path, not just the rendering. */
  def qMultimodalEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    val n = greatest(lit(1L), col("n_bytes"))
    qMultimodalEmbedTyped(spark, sfDir)
      .select(col("doc_id"), col("n_bytes"),
        array_join(transform(col("embedding"),
          x => round(x * n).cast("long")), ",").as("histogram"))
  }

  /** Byte-class histogram replayed per UTF-8 BYTE in DuckDB (each byte
    * hex-decoded from hex(encode(text)) — the engine bins payload bytes,
    * so the replay is exact for non-ASCII text too). LEFT JOIN +
    * COALESCE: an empty document produces no rows from `unnest(range(...))`
    * but the Spark side always emits one zero-histogram row (its divisor
    * is `max(1, n_bytes)`) — an inner join would silently drop it. */
  val qMultimodalEmbedSql: String =
    """SELECT d.doc_id, CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
      |  concat_ws(',',
      |    COALESCE(b0, 0), COALESCE(b1, 0), COALESCE(b2, 0), COALESCE(b3, 0),
      |    COALESCE(b4, 0), COALESCE(b5, 0), COALESCE(b6, 0), COALESCE(b7, 0)
      |  ) AS histogram
      |FROM documents d
      |LEFT JOIN (
      |  SELECT doc_id,
      |    count(*) FILTER (WHERE bin = 0) AS b0,
      |    count(*) FILTER (WHERE bin = 1) AS b1,
      |    count(*) FILTER (WHERE bin = 2) AS b2,
      |    count(*) FILTER (WHERE bin = 3) AS b3,
      |    count(*) FILTER (WHERE bin = 4) AS b4,
      |    count(*) FILTER (WHERE bin = 5) AS b5,
      |    count(*) FILTER (WHERE bin = 6) AS b6,
      |    count(*) FILTER (WHERE bin = 7) AS b7
      |  FROM (
      |    SELECT doc_id,
      |      (16 * (strpos('0123456789abcdef', substr(hx, 2*CAST(i AS INT)-1, 1)) - 1)
      |         + (strpos('0123456789abcdef', substr(hx, 2*CAST(i AS INT), 1)) - 1)) // 32 AS bin
      |    FROM (SELECT doc_id, hx,
      |            unnest(range(1, CAST(length(hx) // 2 AS BIGINT) + 1)) AS i
      |          FROM (SELECT doc_id, lower(hex(encode(text))) AS hx FROM documents)))
      |  GROUP BY doc_id) h ON d.doc_id = h.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** One sampled frame: offset into the payload + a fingerprint of the
    * sampled bytes (what a real pipeline feeds the vision encoder). */
  case class Frame(doc_id: Long, frame_idx: Long, byte_offset: Long, frame_hash: Long)

  /** q_multimodal_frames: frame sampling over "video" payloads — every
    * k-th frame of each media row becomes its own row, 1:N via a
    * partition-batched flatMap (the generator analog for binary media).
    * The decode is the same deterministic stub; the Spark-side plumbing —
    * binary in, typed exploded frames out, no shuffle — is real. Frames
    * are hashed from the actual payload bytes. */
  def qMultimodalFrames(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), lit("vid").as("fmt"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    media.mapPartitions { it =>
      it.flatMap { r =>
        val meta = decodeStub(r)
        (0L until meta.frames).map { i =>
          val off = if (meta.frames == 1) 0L else i * (meta.n_bytes / meta.frames)
          val end = Math.min(meta.n_bytes, off + 16).toInt
          var h = 1125899906842597L // deterministic FNV-ish over sampled bytes
          var j = off.toInt
          // & 0xFFL: fold the UNSIGNED byte (fnv64's convention) — a signed
          // Byte >= 0x80 would sign-extend to 64 bits and diverge from the
          // oracle's hex-decoded 0..255 value on non-ASCII payloads
          while (j < end) { h = (h << 5) | (h >>> 59); h ^= (r.payload(j) & 0xFFL); j += 1 }
          Frame(r.doc_id, i, off, h)
        }
      }
    }.toDF()
  }

  /** The rotate-XOR frame hash replayed in DuckDB: 64-bit two's-complement
    * arithmetic emulated in HUGEINT — rotl5(h) = (h·32 mod 2⁶⁴) + (h ÷ 2⁵⁹)
    * (low 5 bits of the product are 0, so + == |), per-byte fold over the
    * sampled window's UTF-8 BYTES hex-decoded from hex(encode(text)) —
    * the engine folds payload bytes MASKED UNSIGNED (`& 0xFFL`), matching
    * this fold's hex-decoded 0..255 values, so offsets, window bounds, and
    * byte values all replay exactly for non-ASCII text too (pinned by the
    * non-ASCII fixture spec in EnvelopeSpec) — signed back at the end. The
    * payload byte at 1-based offset j sits at hex chars (2j-1, 2j). */
  val qMultimodalFramesSql: String =
    """WITH f AS (
      |  SELECT doc_id, lower(hex(encode(text))) AS hx,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n,
      |    CAST(1 + doc_id % 8 AS BIGINT) AS frames
      |  FROM documents
      |), fr AS (
      |  SELECT doc_id, hx, n, frames, unnest(range(frames)) AS frame_idx FROM f
      |), off AS (
      |  SELECT doc_id, hx, n, frame_idx,
      |    CASE WHEN frames = 1 THEN 0 ELSE frame_idx * (n // frames) END AS byte_offset
      |  FROM fr
      |), hashed AS (
      |  SELECT doc_id, frame_idx, byte_offset,
      |    list_reduce(
      |      list_prepend(CAST(1125899906842597 AS HUGEINT),
      |        [CAST(16 * (strpos('0123456789abcdef', substr(hx, 2*CAST(j AS INT)-1, 1)) - 1)
      |             + (strpos('0123456789abcdef', substr(hx, 2*CAST(j AS INT), 1)) - 1) AS HUGEINT)
      |         for j in range(byte_offset + 1, least(n, byte_offset + 16) + 1)]),
      |      (acc, b) -> xor((acc * 32) % 18446744073709551616::HUGEINT
      |                        + acc // 576460752303423488::HUGEINT, b)
      |    ) AS uh
      |  FROM off
      |)
      |SELECT doc_id, frame_idx, byte_offset,
      |  CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
      |    THEN uh - 18446744073709551616::HUGEINT ELSE uh END AS BIGINT) AS frame_hash
      |FROM hashed ORDER BY doc_id, frame_idx""".stripMargin
}
