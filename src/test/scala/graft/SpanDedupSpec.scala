package graft

import org.apache.spark.sql.functions._
import graft.engine.{LlmOps, Tables, TextExprs}

/** Substring-level span dedup: the codegen'd SpanHashes expression pinned
  * against an independent plain-Scala replica, the short-document edges,
  * and the declared two-pass query against a brute-force text-level
  * recount (no hash phase) at sf0.001 — valid there because the whole
  * top-20 sits in the top multiplicity class (68 spans at nd=4), far
  * inside the 100-candidate margin; margin-straddling tie behavior is the
  * oracle differential's job, which replays the margin itself. */
class SpanDedupSpec extends SparkSpec {

  // independent replica of the declared hash algebra (FNV-1a per token,
  // rotl5-xor-FNV-multiply span fold) — NOT the engine's code
  private val Basis = -3750763034362895579L // 14695981039346656037 unsigned
  private val Prime = 1099511628211L
  private def fnv(tok: String): Long =
    tok.getBytes("UTF-8").foldLeft(Basis)((h, b) => (h ^ (b & 0xFFL)) * Prime)
  private def mix(a: Long, b: Long): Long =
    (java.lang.Long.rotateLeft(a, 5) ^ b) * Prime
  private def spanHashesRef(toks: Seq[String], n: Int): Seq[Long] =
    if (toks.length < n) Seq.empty
    else (0 to toks.length - n).map { i =>
      val th = toks.slice(i, i + n).map(fnv)
      th.tail.foldLeft(th.head)(mix)
    }

  test("SpanHashes matches the plain-Scala replica, including edges") {
    import spark.implicits._
    val cases = Seq(
      "a b c d e f g h i j",          // 10 tokens -> 3 spans
      "one two three four five six seven eight", // exactly 8 -> 1 span
      "short doc",                     // 2 tokens -> none
      "",                              // empty -> none
      "x x x x x x x x x")             // repeated token
    val df = cases.toDF("text")
      .withColumn("tk", filter(split(lower(col("text")), " "), t => t =!= lit("")))
      .select(col("text"), TextExprs.spanHashes(col("tk"), 8).as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (c <- cases) {
      val toks = c.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      assert(got(c) == spanHashesRef(toks, 8), s"case '$c'")
    }
  }

  test("q_span_dedup == brute-force text-level recount at sf0.001") {
    val brute = Tables.documents(spark, sf)
      .withColumn("_tk", filter(split(lower(col("text")), " "), t => t =!= lit("")))
      .filter(size(col("_tk")) >= 8)
      .select(col("doc_id"), col("_tk"),
        posexplode(TextExprs.spanHashes(col("_tk"), 8)).as(Seq("pos", "h")))
      .select(col("doc_id"),
        array_join(slice(col("_tk"), col("pos") + 1, lit(8)), " ").as("span"))
      .groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("span").asc)
      .limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val declared = LlmOps.qSpanDedup(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(declared.length == 20, "expected a full top-20 at sf0.001")
    assert(declared.toSeq == brute.toSeq,
      "two-pass candidate algebra must equal the brute-force recount")
    // every reported span genuinely crosses documents
    assert(declared.forall(_._2 >= 2))
  }
}
