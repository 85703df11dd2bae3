package graft

import org.apache.spark.sql.functions._
import graft.engine.LlmOps

/** MinHash-LSH recall on synthetic near-duplicates + cosine sanity. */
class LlmOpsSpec extends SparkSpec {

  test("minhash LSH surfaces a planted near-duplicate pair") {
    import spark.implicits._
    // 60 distinct tokens, one edited → shingle Jaccard ≈ 0.93, which the
    // 4x4 LSH bands detect with p ≈ 0.996 (a marginal ~0.6 pair is a coin
    // flip by design — b bands of r rows fire with 1-(1-j^r)^b)
    val base = Seq.tabulate(60)(i => s"word$i").mkString(" ")
    val nearDup = base.replace("word30", "changed")
    val others = (0 until 20).map(i =>
      s"completely different document number $i with words " +
        Seq.fill(40)(s"tok${i}_${scala.util.Random.nextInt(5)}").mkString(" "))
    val docs = (Seq((0L, base), (1L, nearDup)) ++
      others.zipWithIndex.map { case (t, i) => ((i + 2).toLong, t) })
      .toDF("doc_id", "text")
    val pairs = LlmOps.minhashCandidatePairs(docs)
      .filter(col("jaccard") > 0.5).collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      s"expected (0,1) pair, got ${pairs.mkString(",")}")
  }

  test("minhash bucket cap bounds membership BEFORE aggregation, deterministically") {
    import spark.implicits._
    val text = Seq.tabulate(40)(j => s"tok$j").mkString(" ")
    val docs = (0L until 5L).map(i => (i, text)).toDF("doc_id", "text")
    // identical docs share every band bucket: full run emits all C(5,2) pairs
    assert(LlmOps.minhashCandidatePairs(docs).count() == 10)
    // cap=2 keeps the 2 smallest doc_ids per bucket → exactly the (0,1) pair;
    // a degenerate bucket degrades to cap² work instead of n²
    val capped = LlmOps.minhashCandidatePairs(docs, cap = 2)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(capped == Set((0L, 1L)), s"got $capped")
  }

  test("minhash does not pair unrelated documents above threshold") {
    import spark.implicits._
    val docs = (0 until 10).map(i =>
      (i.toLong, Seq.tabulate(50)(j => s"w${i}x$j").mkString(" "))).toDF("doc_id", "text")
    val pairs = LlmOps.minhashCandidatePairs(docs).filter(col("jaccard") > 0.5)
    assert(pairs.count() == 0)
  }

  test("dedup groups: transitive chain a~b~c collapses to one component, one keeper") {
    import spark.implicits._
    val base = Seq.tabulate(80)(i => s"tok$i").mkString(" ")
    val b = base.replace("tok10", "x")        // a~b close
    val c = b.replace("tok70", "y")           // b~c close, a~c less so
    val others = (0 until 10).map(i => ((i + 3).toLong,
      Seq.tabulate(60)(j => s"u${i}v$j").mkString(" ")))
    val docs = (Seq((0L, base), (1L, b), (2L, c)) ++ others).toDF("doc_id", "text")
    val out = LlmOps.dedupGroups(docs, 0.7).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(0L)._1 == out(1L)._1 && out(1L)._1 == out(2L)._1,
      "chain must share one component (transitive closure)")
    assert(out(0L)._2 && !out(1L)._2 && !out(2L)._2, "min doc_id is the keeper")
    assert(out(5L)._2, "singletons keep themselves")
  }

  test("connectedComponents handles multi-hop chains and isolated nodes") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val nodes = (1L to 12L).toDF("doc_id")
    val comp = LlmOps.connectedComponents(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(comp).distinct == Seq(1L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(12L) == 12L)
  }

  test("cosine top-k: rank 1 neighbor has the highest similarity, self excluded") {
    val topk = LlmOps.qSimTopk(spark, sf)
    val rows = topk.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self must be excluded")
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.forall { case (_, rs) => rs.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L) })
  }

  test("k-means training improves (or holds) mean best-centroid similarity") {
    val vecs = graft.engine.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val init = graft.engine.KMeans.train(vecs, 8, 0)
    val trained = graft.engine.KMeans.train(vecs, 8, 2)
    val s0 = graft.engine.KMeans.meanBestSim(vecs, init)
    val s2 = graft.engine.KMeans.meanBestSim(vecs, trained)
    assert(s2 >= s0 - 1e-9, s"training must not degrade quantization: $s0 -> $s2")
    assert(trained.count() == 8)
    // centroids keep the embedding dimensionality
    assert(trained.select(size(col("ce"))).collect().forall(_.getInt(0) == 64))
  }

  test("simhash of identical docs is identical; one-token edit stays hamming-close") {
    import spark.implicits._
    val a = Seq.tabulate(60)(i => s"word$i").mkString(" ")
    val b = a.replace("word30", "other")
    val docs = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    // reuse the declared query through a temp swap: compute directly
    val out = graft.engine.LlmOps.qDedupSimhash(spark, sf) // smoke the declared one
    assert(out.columns.contains("simhash"))
    val hashes = docsSimhash(docs)
    assert(hashes(1L) == hashes(2L))
    val ham = java.lang.Long.bitCount(hashes(1L) ^ hashes(3L))
    assert(ham <= 16, s"hamming distance $ham too large for a near-dup")
  }

  test("native ShingleHashes expression is bit-identical to the HOF chain") {
    val docs = graft.engine.Tables.documents(spark, sf)
    val toks = filter(split(lower(col("text")), " "), t => t =!= lit(""))
    val both = docs.select(
      sort_array(array_distinct(graft.engine.TextExprs.shingleHashes(toks))).as("native"),
      sort_array(array_distinct(graft.engine.LlmOps.shingleHashesOf(toks))).as("hof"),
      col("doc_id"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0,
      "codegen'd shingle hashes must reproduce the HOF chain bits exactly")
    // short-text fallback paths: 0, 1, 2, 3 tokens
    import spark.implicits._
    val edge = Seq("", "one", "two words", "three word text").toDF("text")
    val e = edge.select(
      sort_array(graft.engine.TextExprs.shingleHashes(toks)).as("native"),
      sort_array(graft.engine.LlmOps.shingleHashesOf(toks)).as("hof"))
    assert(e.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("native SimHash64 expression is bit-identical to the HOF formulation") {
    val docs = graft.engine.Tables.documents(spark, sf)
    val both = docs.select(
      graft.engine.TextExprs.simhash64(
        filter(split(lower(col("text")), " "), t => t =!= lit(""))).as("native"),
      graft.engine.LlmOps.simhashHof(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0,
      "codegen'd simhash must reproduce the reference HOF bits exactly")
    // and it must actually run inside whole-stage codegen
    both.collect()
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected a codegen stage:\n${plan.take(600)}")
  }

  test("TokenCounts scan equals the regex/split formulation") {
    import spark.implicits._
    // real corpus + adversarial edges: multibyte runs, digits glued to
    // letters, leading/trailing/multiple spaces, empty, punctuation runs
    val edges = Seq("", " ", "  a  ", "abc123def", "¡héllo, wörld! 世界123",
      "a!b?c", "...", "1 22 333", "ÁÉÍ", "tab\tnl\nmix 7x", "ζζ zz 99")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val docs = engine.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .unionByName(edges.select(col("doc_id"), col("text")))
    val cmp = docs
      .withColumn("_tc", engine.TextExprs.tokenCounts(lower(col("text"))))
      .select(
        size(filter(split(lower(col("text")), " "), t => t =!= lit("")))
          .cast("long").as("ws_ref"),
        regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
          .cast("long").as("sub_ref"),
        (length(lower(col("text"))) -
          length(regexp_replace(lower(col("text")), "[a-z0-9 ]", "")))
          .cast("long").as("alnum_ref"),
        col("_tc").getField("ws").as("ws"),
        col("_tc").getField("sub").as("sub"),
        col("_tc").getField("alnum").as("alnum"))
      .filter(col("ws") =!= col("ws_ref") || col("sub") =!= col("sub_ref") ||
        col("alnum") =!= col("alnum_ref"))
    assert(cmp.count() == 0, cmp.collect().take(5).mkString("; "))
  }

  test("RollingFingerprint is bit-identical to a plain-Scala reference fold") {
    val docs = engine.Tables.documents(spark, sf)
    val toks = filter(split(lower(col("text")), " "), t => t =!= lit(""))
    def fnv(tok: String): Long = {
      var h = engine.RollingFingerprint.FnvBasis
      tok.getBytes("UTF-8").foreach(b => h = (h ^ (b & 0xFFL)) * engine.RollingFingerprint.FnvPrime)
      h
    }
    val rows = docs.select(col("text"),
      engine.TextExprs.rollingFingerprint(toks).as("native")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = r.getString(0).toLowerCase.split(" ").filter(_.nonEmpty)
        .foldLeft(0L)((acc, t) => java.lang.Long.rotateLeft(acc, 5) ^ fnv(t))
      assert(r.getLong(1) == expect, s"fingerprint mismatch on: ${r.getString(0).take(60)}")
    }
    // empty token array folds to the zero seed
    import spark.implicits._
    val empty = Seq("").toDF("text")
      .select(engine.TextExprs.rollingFingerprint(
        filter(split(col("text"), " "), t => t =!= lit(""))))
      .collect()(0).getLong(0)
    assert(empty == 0L)
  }

  private def docsSimhash(docs: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val th = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b_$i")
    }
    val agg = th.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { i =>
      when(col(s"b_$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sim.as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }
}
