package graft

import org.apache.spark.sql.functions._
import graft.engine.LlmOps

/** Incremental (cross-snapshot) dedup + span scrub: the branches the
  * sf0.01 driver gate cannot exercise (the synthetic corpus has zero
  * exact duplicates across the %10 split at that scale) pinned on
  * hand-built fixtures — exact-before-near precedence, band-bucket
  * ground truth for the near test, and token-exact scrub reconstruction
  * including overlapping span occurrences. */
class CorpusDeltaSpec extends SparkSpec {

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("corpusDelta: exact_dup wins over near_dup; near matches the band buckets") {
    import spark.implicits._
    val boiler = (1 to 40).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, boiler),
      (2L, s"$boiler extra trailing words"),
      (3L, "totally different unrelated corpus content over here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, boiler),                 // identical text: exact AND near — exact must win
      (102L, s"$boiler changed"),     // high-overlap: near iff a band bucket collides
      (103L, "zebra quokka xylophone never seen before anywhere at all")
    ).toDF("doc_id", "text")
    val got = LlmOps.corpusDelta(corpus, batch).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(101L) == "exact_dup", s"precedence: got ${got(101L)}")
    // the DECLARED near test is LSH band-bucket collision, not jaccard —
    // assert against the actual buckets, not against hope
    val corpusBuckets = LlmOps.bandKeys(corpus)
      .select(col("band"), col("band_key")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    def expected(id: Long): String = {
      val b = LlmOps.bandKeys(batch.filter(col("doc_id") === id))
        .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
      if (b.exists(corpusBuckets)) "near_dup" else "new"
    }
    assert(got(102L) == expected(102L), s"102: got ${got(102L)}")
    assert(got(103L) == expected(103L), s"103: got ${got(103L)}")
    assert(got.keySet == Set(101L, 102L, 103L), "one row per batch doc")
  }

  test("q_stream_delta == q_corpus_delta: per-batch index probe loses nothing") {
    val batch = LlmOps.qCorpusDelta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val stream = graft.engine.Streaming.qStreamDelta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(stream == batch,
      s"stream/batch divergence: ${stream.diff(batch).take(5)} vs ${batch.diff(stream).take(5)}")
  }

  test("spanScrub: exact token removal, empty/overlapping/untouched docs") {
    import spark.implicits._
    val span = "a b c d e f g h"
    val docs = Seq(
      (1L, s"x $span y"),                 // 10 tokens, middle 8 removed
      (2L, s"$span $span"),               // two disjoint occurrences: all 16 removed
      (3L, "no boilerplate here at all friends"), // untouched
      (4L, "a a a a a a a a a")           // 9 tokens, OVERLAPPING matches of
    ).toDF("doc_id", "text")              // "a a a a a a a a" cover all 9
    val got = LlmOps.spanScrub(docs, Seq(span, "a a a a a a a a"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((10L, 8L, sha256Hex("x y"))))
    assert(got(2L) == ((16L, 16L, sha256Hex(""))))
    assert(got(3L) == ((6L, 0L, sha256Hex("no boilerplate here at all friends"))))
    assert(got(4L) == ((9L, 9L, sha256Hex(""))))
  }
}
