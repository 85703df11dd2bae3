package graft

import org.apache.spark.sql.functions._
import graft.engine.{LlmOps, Tables}

/** Index GC (takedown / deletion): the refcount algebra that makes
  * deletion index-local. Pins (1) the headline invariant —
  * gc(refIndex(C), F) is probe-equal to an index built from scratch
  * over C ∖ F; (2) shared-key survival — forgetting one of two
  * identical docs must NOT delete the digest both claim; (3) refcount
  * transparency — the cnt column changes no probe answer; (4) the
  * visible takedown witness in the declared query — forgotten re-sent
  * docs flip off exact_dup unless a retained doc still carries the
  * bytes. */
class CorpusGcSpec extends SparkSpec {

  private def statuses(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  test("gc invariant: probe after gc == probe against the retained-corpus index") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val forget = corpus.filter(col("doc_id") % 30 === 0)
      .select(col("doc_id"), col("text"))
    val batch = LlmOps.deltaBatch(docs)
    val gc = statuses(
      LlmOps.probeDelta(LlmOps.gcIndex(LlmOps.buildRefIndex(corpus), forget), batch))
    val rebuilt = statuses(
      LlmOps.corpusDelta(corpus.filter(col("doc_id") % 30 =!= 0), batch))
    assert(forget.count() > 0, "fixture must actually forget something")
    assert(gc == rebuilt,
      s"gc/rebuild divergence: ${gc.diff(rebuilt).take(5)} vs ${rebuilt.diff(gc).take(5)}")
  }

  test("refcount keeps shared keys: one of two identical docs forgotten -> digest survives; both -> gone") {
    import spark.implicits._
    val same = (1 to 40).map(i => s"shared$i").mkString(" ")
    val corpus = Seq(
      (1L, same), (2L, same),
      (3L, "totally different retained content over here")
    ).toDF("doc_id", "text")
    val idx = LlmOps.buildRefIndex(corpus)
    def digests(i: LlmOps.CorpusIndex): Set[String] =
      i.digests.select("dg").collect().map(_.getString(0)).toSet
    val dgSame = corpus.filter(col("doc_id") === 1L)
      .select(sha2(col("text"), 256)).head().getString(0)
    val oneGone = LlmOps.gcIndex(idx, corpus.filter(col("doc_id") === 1L)
      .select(col("doc_id"), col("text")))
    assert(digests(oneGone).contains(dgSame),
      "digest still claimed by doc 2 must survive forgetting doc 1")
    val bothGone = LlmOps.gcIndex(oneGone, corpus.filter(col("doc_id") === 2L)
      .select(col("doc_id"), col("text")))
    assert(!digests(bothGone).contains(dgSame),
      "digest with no remaining claimant must be deleted")
    // buckets follow the same algebra: doc 3's buckets survive throughout
    val b3 = LlmOps.bandKeys(corpus.filter(col("doc_id") === 3L))
      .select(col("band"), col("band_key"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val left = bothGone.buckets.select(col("band"), col("band_key"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(left == b3, s"only doc 3's buckets should remain, got $left vs $b3")
  }

  test("refcounted index is probe-transparent: same statuses as the distinct index") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val batch = LlmOps.deltaBatch(docs)
    val ref = statuses(LlmOps.probeDelta(LlmOps.buildRefIndex(corpus), batch))
    val dst = statuses(LlmOps.corpusDelta(corpus, batch))
    assert(ref == dst, "cnt column must not change any probe answer")
  }

  test("q_corpus_gc: forgotten re-sent docs flip off exact_dup (the takedown witness)") {
    val docs = Tables.documents(spark, sf)
    val pre = statuses(LlmOps.qCorpusDelta(spark, sf)).toMap
    val post = statuses(LlmOps.qCorpusGc(spark, sf)).toMap
    // re-sent copies of forgotten docs: orig % 120 == 0 (forgotten: %30==0
    // in the %10<8 corpus; re-sent: %40==0) — unless a RETAINED doc still
    // carries the same bytes, the flip off exact_dup must be observable
    val docRows = docs.select(col("doc_id"), sha2(col("text"), 256).as("dg"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val retainedDigests = docRows
      .filter { case (id, _) => id % 10 < 8 && id % 30 != 0 }.map(_._2).toSet
    val witnesses = docRows.filter { case (id, _) => id % 120 == 0 }
    assert(witnesses.nonEmpty, "fixture needs at least one forgotten+resent doc")
    witnesses.foreach { case (id, dg) =>
      val resent = id + LlmOps.Resend
      assert(pre(resent) == "exact_dup", s"pre-gc resend of $id must be exact_dup")
      if (!retainedDigests.contains(dg))
        assert(post(resent) != "exact_dup",
          s"post-gc resend of $id must no longer be exact_dup, got ${post(resent)}")
    }
    // and every non-witness status is untouched only where the oracle says
    // so — the full-surface agreement is pinned by the gc-invariant test
    assert(post.keySet == pre.keySet, "same batch rows either side of gc")
  }
}
