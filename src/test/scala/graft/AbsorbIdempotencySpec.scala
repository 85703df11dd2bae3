package graft

import org.apache.spark.sql.functions._
import graft.engine.LlmOps

/** Crash-and-retry audit of the two non-atomic maintenance passes the
  * round-12 verdict named alongside the tiered fold (directive 4):
  *
  *  - [[LlmOps.absorbInto]]'s digests/buckets appends are not atomic as a
  *    pair, but the anti-join discipline makes a RETRY self-healing: rows
  *    already present append nothing, missing rows (a lost second append,
  *    a torn partial commit) are re-derived from the batch and filled in.
  *    These tests crash the pass both ways and pin retry == clean twin.
  *  - [[LlmOps.compactIndexCutover]] fences the build-then-drop offline
  *    compaction: a retry from any crash point (partial build, between
  *    build and drop, mid-drop, after drop) converges to exactly one
  *    index — the state that previously wedged (source half-dropped,
  *    rebuild impossible) now completes the drop and returns. */
class AbsorbIdempotencySpec extends SparkSpec {

  private val hfs = org.apache.hadoop.fs.FileSystem.getLocal(
    TestSession.spark.sessionState.newHadoopConf())

  private def docs = engine.Tables.documents(spark, sf)
  private def corpus = docs.filter(col("doc_id") % 10 < 6)
  private def batch = docs.filter(col("doc_id") % 10 >= 6)
    .select(col("doc_id"), col("text"))

  private def contentOf(name: String): (Set[String], Set[(Int, Long)]) = {
    val v = LlmOps.loadBucketedIndex(spark, name)
    (v.digests.collect().map(_.getString(0)).toSet,
      v.buckets.collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
  }

  private def rmTree(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }

  test("absorbInto retried after a crash between the pair's appends converges") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_absA").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_absB").toString
    val (a, b) = ("graft_spec_abs_a", "graft_spec_abs_b")
    try {
      LlmOps.saveBucketedIndex(spark, LlmOps.buildCorpusIndex(corpus), dirA, a)
      LlmOps.saveBucketedIndex(spark, LlmOps.buildCorpusIndex(corpus), dirB, b)

      // simulate the crash: the digests append committed, the buckets
      // append never ran — rewind buckets to its pre-absorb state
      LlmOps.absorbInto(spark, a, batch, gen = 1L)
      spark.sql(s"ALTER TABLE ${a}_buckets DROP IF EXISTS PARTITION (gen=1)")
      val bloc = new org.apache.hadoop.fs.Path(s"$dirA/buckets/gen=1")
      hfs.delete(bloc, true)
      spark.catalog.refreshTable(s"${a}_buckets")

      // the replayed batch re-runs the SAME absorb: digests anti-join
      // appends nothing, buckets absorbs what the crash lost
      LlmOps.absorbInto(spark, a, batch, gen = 1L)
      LlmOps.absorbInto(spark, b, batch, gen = 1L)
      assert(contentOf(a) == contentOf(b),
        "retried absorb must equal the uninterrupted twin row-for-row")
    } finally {
      LlmOps.dropBucketedIndex(spark, a); LlmOps.dropBucketedIndex(spark, b)
      rmTree(dirA); rmTree(dirB)
    }
  }

  test("absorbInto retried after a TORN digests append back-fills the lost rows") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_absTA").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_absTB").toString
    val (a, b) = ("graft_spec_abst_a", "graft_spec_abst_b")
    try {
      LlmOps.saveBucketedIndex(spark, LlmOps.buildCorpusIndex(corpus), dirA, a)
      LlmOps.saveBucketedIndex(spark, LlmOps.buildCorpusIndex(corpus), dirB, b)

      // torn dynamic-partition commit: one of the digests gen=1 files is
      // lost mid-commit — the partition LOOKS present but is missing rows
      LlmOps.absorbInto(spark, a, batch, gen = 1L)
      val gdir = new org.apache.hadoop.fs.Path(s"$dirA/digests/gen=1")
      val part = hfs.listStatus(gdir)
        .filter(_.getPath.getName.startsWith("part-")).head.getPath
      hfs.delete(part, false)
      spark.catalog.refreshTable(s"${a}_digests")
      val torn = contentOf(a)

      LlmOps.absorbInto(spark, a, batch, gen = 1L)
      LlmOps.absorbInto(spark, b, batch, gen = 1L)
      assert(contentOf(a) == contentOf(b),
        "the retry must re-derive exactly the lost digests from the batch")
      assert(torn._1.subsetOf(contentOf(a)._1) && torn._1 != contentOf(a)._1,
        "the torn state must have been missing rows for this test to mean anything")
    } finally {
      LlmOps.dropBucketedIndex(spark, a); LlmOps.dropBucketedIndex(spark, b)
      rmTree(dirA); rmTree(dirB)
    }
  }

  test("compactIndexCutover converges from every crash point") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cut").toString
    val (from, to) = ("graft_spec_cut_from", "graft_spec_cut_to")
    try {
      LlmOps.saveBucketedIndex(spark, LlmOps.buildCorpusIndex(corpus), s"$dir/g", from)
      LlmOps.absorbInto(spark, from, batch, gen = 1L)
      val want = contentOf(from)

      // crash point 1: a PARTIAL build of `to` (one file torn away), from
      // intact — the retry's overwrite must rewrite `to` completely
      LlmOps.compactIndex(spark, from, s"$dir/c", to)
      val tdir = new org.apache.hadoop.fs.Path(s"$dir/c/digests/gen=0")
      val part = hfs.listStatus(tdir)
        .filter(_.getPath.getName.startsWith("part-")).head.getPath
      hfs.delete(part, false)
      spark.catalog.refreshTable(s"${to}_digests")
      LlmOps.compactIndexCutover(spark, from, s"$dir/c", to)
      assert(contentOf(to) == want, "retry after a partial build must rebuild in full")
      assert(!spark.catalog.tableExists(s"${from}_digests"),
        "the cutover must have dropped the source")

      // crash point 2: mid-drop — digests dropped, buckets left behind.
      // Rebuild the torn state, then the retry must finish the drop
      // WITHOUT touching the committed target
      LlmOps.saveBucketedIndex(spark, LlmOps.buildCorpusIndex(corpus), s"$dir/g2", from)
      spark.sql(s"DROP TABLE ${from}_digests")
      LlmOps.compactIndexCutover(spark, from, s"$dir/c", to)
      assert(!spark.catalog.tableExists(s"${from}_buckets"),
        "the retry must finish the torn drop")
      assert(contentOf(to) == want, "the committed target must be untouched")

      // crash point 3: after the drop (retry of a fully completed pass)
      LlmOps.compactIndexCutover(spark, from, s"$dir/c", to)
      assert(contentOf(to) == want)

      // and the fence: source gone AND target gone is a real error, not
      // a silent no-op
      spark.sql(s"DROP TABLE ${to}_digests")
      val boom = intercept[IllegalArgumentException] {
        LlmOps.compactIndexCutover(spark, from, s"$dir/c", to)
      }
      assert(boom.getMessage.contains("cutover"), boom.getMessage)
    } finally {
      LlmOps.dropBucketedIndex(spark, from); LlmOps.dropBucketedIndex(spark, to)
      rmTree(dir)
    }
  }
}
