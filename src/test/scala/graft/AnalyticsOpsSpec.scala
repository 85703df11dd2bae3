package graft

import org.apache.spark.sql.functions._
import graft.engine.{Graph, LlmOps, Relational, Tables}

/** Specs for the round-6 analytics additions: ordered string aggregation,
  * all-pairs rare-term cosine, integer-exact PageRank. Each is checked by
  * an EXACT driver-side replay of the declared recurrence on sf0.001 (50
  * documents / 6 k lineitems — small enough to recompute in plain Scala),
  * so the assertions are bit-for-bit, not property-shaped. */
class AnalyticsOpsSpec extends SparkSpec {

  // --- q_listagg ----------------------------------------------------------

  test("q_listagg == driver-side replay of the ordered concatenation") {
    val out = Relational.qListagg(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val building = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val expected = Tables.orders(spark, sf)
      // ISO-rendered timestamp: lexicographic == chronological
      .select(col("o_custkey"), col("o_orderdate").cast("string"),
        col("o_orderkey"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .filter(t => building.contains(t._1))
      .groupBy(_._1)
      .map { case (ck, rows) =>
        val sorted = rows.sortBy(t => (t._2, t._3))
        ck -> ((rows.size.toLong, sorted.map(_._4).mkString("|")))
      }
    assert(out == expected)
    assert(out.nonEmpty)
  }

  // --- q_cosine_pairs -----------------------------------------------------

  test("q_cosine_pairs == exhaustive driver-side replay (dedup, df prune, " +
      "integer dot/norm, IEEE cosine, tie-broken top-50)") {
    val rows = LlmOps.qCosinePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // replay: reps = min doc_id per exact text
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val reps = docs.groupBy(_._2).map { case (t, g) => (g.map(_._1).min, t) }.toSeq
    def toks(t: String): Seq[String] = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    val tf: Map[(Long, String), Long] = reps
      .flatMap { case (id, t) => toks(t).map(w => (id, w)) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val df: Map[String, Int] =
      tf.keys.toSeq.groupBy(_._2).map { case (w, g) => w -> g.size }
    val rare = tf.filter { case ((_, w), _) => df(w) <= 256 }
    val nrm: Map[Long, Long] = rare.groupBy(_._1._1)
      .map { case (id, m) => id -> m.values.map(c => c * c).sum }
    val byDoc = rare.groupBy(_._1._1)
      .map { case (id, m) => id -> m.map { case ((_, w), c) => w -> c } }
    val ids = byDoc.keys.toSeq.sorted
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      shared = byDoc(a).keySet intersect byDoc(b).keySet
      if shared.nonEmpty
    } yield {
      val dot = shared.toSeq.map(w => byDoc(a)(w) * byDoc(b)(w)).sum
      (a, b, dot.toDouble / math.sqrt((nrm(a) * nrm(b)).toDouble))
    }
    val expected = pairs.sortBy { case (a, b, c) => (-c, a, b) }.take(50)
    assert(rows == expected)
    assert(rows.nonEmpty && rows.forall { case (a, b, c) =>
      a < b && c > 0.0 && c <= 1.0 })
  }

  // --- q_curation_pipeline ------------------------------------------------

  test("q_curation_pipeline == driver-side replay of dedup → gate → chunk") {
    val out = graft.engine.Curation.qCurationPipeline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getString(6)))
      .sortBy(t => (t._1, t._2)).toSeq
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val stops = Set("the", "a", "of", "and", "to", "in", "is")
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.groupBy(_._2).toSeq
      .map { case (text, g) =>
        (g.map(_._1).min, text, g.map(_._3).min, g.map(_._4).min) }
      .filter(_._3 == "en")
      .flatMap { case (id, text, lang, source) =>
        val tk = text.toLowerCase.split(" ").filter(_.nonEmpty)
        if (tk.length >= 10 && tk.exists(stops)) {
          (0 until tk.length by 48).zipWithIndex.map { case (start, ci) =>
            val chunk = tk.slice(start, start + 64)
            (id, ci.toLong, start.toLong, chunk.length.toLong,
              sha(chunk.mkString(" ")), lang, source)
          }
        } else Seq.empty
      }.sortBy(t => (t._1, t._2))
    assert(out == expected)
    assert(out.nonEmpty)
  }

  // --- q_pagerank ---------------------------------------------------------

  /** The declared integer recurrence in plain Scala (Long `/` == `div` on
    * the non-negative values here). */
  private def simulate(edges: Seq[(Long, Long)], iters: Int)
      : Map[(String, Long), Long] = {
    val dir = edges.distinct.flatMap { case (s, p) =>
      Seq((("s", s), ("p", p)), (("p", p), ("s", s))) }
    val outdeg = dir.groupBy(_._1).map { case (u, g) => u -> g.size.toLong }
    val nodes = outdeg.keys.toSeq
    val n = nodes.size.toLong
    val scale = 1000000000000L
    var r = nodes.map(v => v -> scale / n).toMap
    for (_ <- 1 to iters) {
      val msgs = dir.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) => r(u) / outdeg(u) }.sum }
      r = nodes.map(v => v ->
        ((15L * (scale / n)) / 100L + (85L * msgs.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("rankBipartite == exact integer simulation on a hand graph") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L), (3L, 10L))
    val got = Graph.rankBipartite(edges.toDF("s", "p"), 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == simulate(edges, 3))
  }

  test("rankBipartite: symmetric positions get identical ranks; hubs rank " +
      "above leaves; mass never exceeds SCALE") {
    import spark.implicits._
    // p10 and p11 are exchangeable; s1 is the hub
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
    val r = Graph.rankBipartite(edges.toDF("s", "p"), 3).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(3)).toMap
    assert(r(("p", 10L)) == r(("p", 11L)))
    assert(r(("s", 1L)) == r(("s", 2L)))
    assert(r.values.sum <= 1000000000000L) // floor division only loses mass
  }

  test("q_pagerank on sf0.001: 20 rows, integer ranks descending") {
    val rows = Graph.qPagerank(spark, sf).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getLong(2))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    assert(ranks.forall(_ > 0))
  }
}
