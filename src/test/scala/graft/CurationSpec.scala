package graft

import org.apache.spark.sql.functions._
import graft.engine.Curation

/** Curation operators: repetition math on hand-built docs, PII scrub
  * behavior on literal text, decontamination set semantics. */
class CurationSpec extends SparkSpec {

  test("repetition fractions match hand-computed values and bounds") {
    val rep = Curation.qRepetition(spark, sf)
    val rows = rep.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nDis = r.getAs[Long]("n_distinct")
      val top = r.getAs[Long]("top_token_n")
      val n3 = r.getAs[Long]("n_3grams")
      val n3d = r.getAs[Long]("n_3grams_distinct")
      assert(nDis <= nTok && top <= nTok && n3d <= n3)
      // shingle count law: max(n_tokens - 2, 1) for non-empty docs
      assert(n3 == math.max(nTok - 2, 1L), s"doc ${r.get(0)}: n3=$n3 nTok=$nTok")
      val dupF = r.getAs[Double]("dup_token_frac")
      assert(dupF >= 0.0 && dupF < 1.0)
      assert(dupF == 1.0 - nDis.toDouble / nTok.toDouble) // exact, not approx
    }
  }

  test("piiScrub counts and redacts each category, leaving no residue") {
    import spark.implicits._
    val df = Seq(
      "contact bob.smith+x@mail.example.co or (212) 555-0143 from 192.168.001.042",
      "no pii here at all",
      "two mails a@b.io c@d.org one ip 8.8.8.8").toDF("t")
      .select(col("t") +: Curation.piiScrub(col("t")): _*)
      .collect()
    assert(df(0).getAs[Long]("n_emails") == 1)
    assert(df(0).getAs[Long]("n_phones") == 1)
    assert(df(0).getAs[Long]("n_ips") == 1)
    assert(df(0).getAs[String]("redacted") == "contact [EMAIL] or [PHONE] from [IP]")
    assert(df(1).getAs[String]("redacted") == "no pii here at all")
    assert(df(2).getAs[Long]("n_emails") == 2 && df(2).getAs[Long]("n_ips") == 1)
    // redacted text carries no survivor of any pattern
    df.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(!red.matches(s".*${Curation.emailRe}.*"), red)
      assert(!red.matches(s".*${Curation.ipRe}.*"), red)
    }
  }

  test("url extraction yields the primary url per event plus mirrors for user_id%4==0") {
    val urls = Curation.qUrlExtract(spark, sf)
    val events = graft.engine.Tables.events(spark, sf)
    val nEvents = events.count()
    val nMirror = events.filter(col("user_id") % 4 === 0).count()
    assert(urls.count() == nEvents + nMirror)
    assert(urls.filter(!col("is_secure")).count() == nMirror)
    // every domain parses non-empty and matches the url it came from
    assert(urls.filter(col("domain") === "" ||
      !col("url").contains(col("domain"))).count() == 0)
  }

  test("decontamination excludes eval docs and bounds the fraction") {
    val dec = Curation.qDecontaminate(spark, sf).collect()
    assert(dec.nonEmpty)
    assert(dec.forall(_.getAs[Long]("doc_id") % 50 != 0), "eval docs leaked into output")
    dec.foreach { r =>
      val c = r.getAs[Double]("contamination")
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_shingles"))
    }
    // word-salad corpus from a tiny vocab: the eval split must share
    // 3-grams with SOME training doc, or the operator is vacuous here
    assert(dec.exists(_.getAs[Long]("n_contaminated") > 0))
  }
}
