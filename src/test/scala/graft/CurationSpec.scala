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

  /** The shipped scanner's 4 columns, same shape as piiScrubRegex. */
  private def piiNative(text: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = {
    val s = graft.engine.TextExprs.piiScrub(text)
    Seq(s.getField("n_emails").as("n_emails"), s.getField("n_phones").as("n_phones"),
      s.getField("n_ips").as("n_ips"), s.getField("redacted").as("redacted"))
  }

  test("piiScrub counts and redacts each category, leaving no residue") {
    import spark.implicits._
    val df = Seq(
      "contact bob.smith+x@mail.example.co or (212) 555-0143 from 192.168.001.042",
      "no pii here at all",
      "two mails a@b.io c@d.org one ip 8.8.8.8").toDF("t")
      .select(col("t") +: piiNative(col("t")): _*)
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

  test("native RepetitionStats matches a plain-Scala model on corpus + edges") {
    import spark.implicits._
    val edges = Seq("", "one", "two words", "a a a", "a b a b a b",
      "x y z x y z x y z", "solo " * 2000).toDF("text")
    val docs = graft.engine.Tables.documents(spark, sf).select(col("text"))
      .unionByName(edges)
    val toks = filter(split(lower(col("text")), " "), t => t =!= lit(""))
    val rows = docs
      .select(col("text"), graft.engine.TextExprs.repetitionStats(toks).as("rs"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tk = r.getString(0).toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq
      val s = r.getStruct(1)
      val grouped = tk.groupBy(identity)
      val (n3, n3d) =
        if (tk.length >= 3) {
          val sh = tk.sliding(3).map(_.mkString(" ")).toSeq
          (sh.length.toLong, sh.distinct.length.toLong)
        } else (1L, 1L)
      val expect = (tk.length.toLong, grouped.size.toLong,
        if (tk.isEmpty) 0L else grouped.values.map(_.length).max.toLong, n3, n3d)
      val got = (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4))
      assert(got == expect, s"on: ${r.getString(0).take(50)} got=$got expect=$expect")
    }
  }

  test("native PiiScrub scanner is byte-equal to the regex formulation") {
    import spark.implicits._
    // the real corpus lines + adversarial edges: pattern overlaps (an
    // email local part swallowing a phone/IP tail), domain backtracking,
    // 1-letter TLDs, 4+-digit octets, adjacent emails, multibyte breaks
    val edges = Seq(
      "(123) 456-7890@x.com",             // phone counted, never redacted
      "u1.2.3.44@example.com",            // IP inside the local part
      "ip 1234.5.6.7 and 1.2.3.4567 and 999.999.999.999.999",
      "a@b.c.d.com. trailing a@b.c x@y.co1 a@b.comx123",
      "a@b.cc@d.ee (21) 555-0143 ((212) 555-0143)",
      "héllo@wörld.com naïve 1.2.3.4", "", " ", "@nope a@b", "-@-.ab")
      .toDF("line")
    val lines = graft.engine.Tables.events(spark, sf)
      .select(concat(
        lit("uid="), col("user_id").cast("string"),
        lit(" email=user"), col("user_id").cast("string"), lit("@example.com"),
        lit(" ip=10.0."), (col("event_id") % 256).cast("string"),
        lit(".7 phone=("), (col("event_id") % 900 + 100).cast("string"),
        lit(") 555-1234")).as("line"))
      .unionByName(edges)
    val n = piiNative(col("line"))
    val r = Curation.piiScrubRegex(col("line"))
    val cmp = lines.select(col("line"),
      n(0).as("ne"), n(1).as("np"), n(2).as("ni"), n(3).as("nr"),
      r(0).as("re"), r(1).as("rp"), r(2).as("ri"), r(3).as("rr"))
    val bad = cmp.filter(col("ne") =!= col("re") || col("np") =!= col("rp") ||
      col("ni") =!= col("ri") || col("nr") =!= col("rr"))
    assert(bad.count() == 0, bad.collect().take(3).mkString("\n"))
    // the shipped query runs the scanner inside whole-stage codegen
    val q = Curation.qPiiScrub(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected a codegen stage:\n${plan.take(600)}")
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
