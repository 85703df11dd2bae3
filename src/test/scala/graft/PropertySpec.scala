package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.engine.Aggregators.{TopKAggregator, TopKBuf}
import graft.engine.StateMachine

/** ScalaCheck properties for the algebra the reference enforces only
  * operationally (SURVEY.md §5.3): pagination partitions an ordered scan,
  * windows tile, backoff/schedule laws, top-k merge laws. */
class PropertySpec extends SparkSpec {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, s"$name: $res")
  }

  test("pagination partitions any ordered sequence (pure model of page())") {
    val gen = for {
      n <- Gen.choose(0, 500)
      ps <- Gen.choose(1, 120)
      xs <- Gen.listOfN(n, Gen.choose(0L, 200L)) // many ts ties
    } yield (xs.zipWithIndex.map { case (ts, id) => (ts, id.toLong) }, ps)
    check(Prop.forAll(gen) { case (rows, pageSize) =>
      val ordered = rows.sortBy(r => (r._1, r._2)) // ts ASC, id tiebreak
      val pages = ordered.grouped(pageSize).toList
      pages.flatten == ordered &&
        pages.forall(p => p.size <= pageSize) &&
        pages.map(_.size).sum == rows.size
    }, "pagination")
  }

  test("stream step laws: batches partition [0, target), monotone, bounded, one mode switch") {
    import graft.sources.{PagedMicroBatchStream, PagedStreamOffset}
    val gen = for {
      target <- Gen.choose(0L, 5000L)
      windowRows <- Gen.choose(1L, 2000L)
      pageSize <- Gen.choose(1L, 700L)
      // occasionally the allAvailable limit Trigger.Once forces
      limit <- Gen.oneOf(Gen.const(Long.MaxValue), Gen.const(pageSize))
    } yield (target, windowRows, limit)
    check(Prop.forAll(gen) { case (target, windowRows, limit) =>
      var cur = PagedStreamOffset.Initial
      var batches = List.empty[(Long, Long)] // [from, to) per micro-batch
      var steps = 0
      var done = false
      while (!done && steps < 20000) {
        val next = PagedMicroBatchStream.step(cur, target, windowRows, limit)
        if (next eq cur) done = true
        else { batches ::= (cur.pos, next.pos); cur = next; steps += 1 }
      }
      val bs = batches.reverse
      val admitCap = math.min(limit, windowRows)
      done && // drains to a fixpoint, never spins
        cur.pos == target && // ends exactly at the available extent
        bs.forall { case (a, b) => a < b && b - a <= admitCap } && // monotone, bounded
        bs.map { case (a, b) => b - a }.sum == target && // partition: no loss/dup
        bs.zip(bs.drop(1)).forall { case ((_, b1), (a2, _)) => b1 == a2 } && // contiguous
        // the mode switches INITIAL→INCREMENTAL at most once, never back
        { var prev = "INITIAL_LOAD"; var switches = 0; var sawIncr = false
          var replay = PagedStreamOffset.Initial; var ok = true
          bs.foreach { _ =>
            val n = PagedMicroBatchStream.step(replay, target, windowRows, limit)
            if (n.loadMode != prev) switches += 1
            if (sawIncr && n.loadMode == "INITIAL_LOAD") ok = false
            if (n.loadMode == "INCREMENTAL_LOAD") sawIncr = true
            prev = n.loadMode; replay = n
          }
          ok && switches <= 1 }
    }, "stream step")
  }

  test("half-open windows tile: [a,b) ∪ [b,c) == [a,c), disjoint, any bounds") {
    val gen = for {
      xs <- Gen.listOf(Gen.choose(0L, 1000L))
      a <- Gen.choose(0L, 1000L); d1 <- Gen.choose(0L, 500L); d2 <- Gen.choose(0L, 500L)
    } yield (xs, a, a + d1, a + d1 + d2)
    check(Prop.forAll(gen) { case (xs, a, b, c) =>
      val ab = xs.filter(x => x >= a && x < b)
      val bc = xs.filter(x => x >= b && x < c)
      val ac = xs.filter(x => x >= a && x < c)
      ab.size + bc.size == ac.size && ab.intersect(bc).isEmpty
    }, "window tiling")
  }

  test("backoff laws: monotone to the cap, bounded, jitter <= 10%") {
    val gen = for {
      att <- Gen.choose(0, 20); j <- Gen.choose(0.0, 1.0)
    } yield (att, j)
    check(Prop.forAll(gen) { case (att, j) =>
      val b = StateMachine.backoffMillis(att, rateLimited = false, j)
      val base = StateMachine.backoffMillis(att, rateLimited = false, 0.0)
      // the reference's exact arithmetic (Task.java:330-336): cap applied
      // AFTER the jitter — engine must agree value-for-value
      val rawBase = Math.pow(2.0, att.toDouble).toLong * 1000L
      val ref = Math.min(rawBase + (rawBase * 0.1 * j).toLong, 30000L)
      b == ref && b <= 30000L && b >= base &&
        StateMachine.backoffMillis(att, rateLimited = true, j) == 60000L
    }, "backoff")
  }

  test("cron: next fire strictly after t, matches every restricted field") {
    val gen = for {
      t <- Gen.choose(1577836800000L, 4102444800000L) // 2020..2100
      s <- Gen.choose(0, 59); m <- Gen.choose(0, 59); h <- Gen.choose(0, 23)
      dowTok <- Gen.oneOf("?", "*", "1", "7", "2-6", "1,4,7", "*/2")
    } yield (t, s, m, h, dowTok)
    check(Prop.forAll(gen) { case (t, s, m, h, dowTok) =>
      val c = engine.CronSchedule.parse(s"$s $m $h * * $dowTok").get
      val next = c.nextRunAfter(t)
      val z = java.time.Instant.ofEpochMilli(next).atZone(java.time.ZoneOffset.UTC)
      val quartzDow = z.getDayOfWeek.getValue % 7 + 1
      next > t && z.getSecond == s && z.getMinute == m && z.getHour == h &&
        c.dow.matches(quartzDow) &&
        c.nextRunAfter(next) > next // strict progress when re-fired at a fire time
    }, "cron")
  }

  test("daily schedule: strictly after t, within 24h, at the configured time") {
    val gen = for {
      t <- Gen.choose(0L, 4102444800000L) // through 2100
      h <- Gen.choose(0, 23); m <- Gen.choose(0, 59)
    } yield (t, h, m)
    check(Prop.forAll(gen) { case (t, h, m) =>
      val next = StateMachine.DailySchedule(h, m).nextRunAfter(t)
      val tod = Math.floorMod(next, 86400000L)
      next > t && next - t <= 86400000L && tod == (h * 3600L + m * 60L) * 1000L
    }, "schedule")
  }

  test("top-k merge laws: bounded, sorted, commutative, same as global sort") {
    val agg = new TopKAggregator(5)
    val genBuf = Gen.listOf(Gen.zip(Gen.choose(0.0, 100.0), Gen.choose(0L, 50L)))
    check(Prop.forAll(genBuf, genBuf) { (xs, ys) =>
      def buf(l: List[(Double, Long)]): TopKBuf =
        l.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      val m1 = agg.merge(buf(xs), buf(ys))
      val m2 = agg.merge(buf(ys), buf(xs))
      val expect = (xs ++ ys).sortBy { case (s, i) => (-s, i) }.take(5).map(_._2)
      m1.ids.toSeq == expect && m2.ids.toSeq == expect && m1.ids.length <= 5
    }, "topk merge")
  }

  test("KMV merge laws: k smallest distinct under any partial-merge split, commutative") {
    // Aggregator correctness at scale rests on merge being insensitive to
    // how Spark partitions rows into partial buffers — model that directly
    val agg = new graft.engine.Sketches.KmvAggregator(8)
    val gen = for {
      xs <- Gen.listOf(Gen.choose(0L, 40L)) // heavy duplication
      cut <- Gen.choose(0, 100)
    } yield (xs, cut)
    check(Prop.forAll(gen) { case (xs, cutPct) =>
      val cut = xs.length * cutPct / 100
      val (l, r) = xs.splitAt(cut)
      def buf(part: List[Long]) =
        part.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      val m1 = agg.merge(buf(l), buf(r))
      val m2 = agg.merge(buf(r), buf(l))
      val expect = xs.distinct.sorted.take(8)
      m1.hashes.toSeq == expect && m2.hashes.toSeq == expect
    }, "kmv merge")
  }

  test("classify-then-absorb loop == earlier-file closed form (pure model of q_stream_absorb)") {
    // the sequential ingest loop (classify batch f against the index,
    // then absorb batch f) must equal the closed form the DuckDB oracle
    // evaluates (membership in corpus ∪ strictly-earlier files) — for ANY
    // doc/file/digest/bucket assignment, including same-file duplicates
    // (invisible by the strict rule) and docs duplicating corpus content
    val genCase = for {
      n <- Gen.choose(0, 60)
      docs <- Gen.listOfN(n, for {
        f <- Gen.choose(0, 3)
        d <- Gen.choose(0, 12)         // small alphabet forces collisions
        ks <- Gen.someOf(0 to 8)       // band-bucket set
      } yield (f, d, ks.toSet))
      corpusD <- Gen.someOf(0 to 12)
      corpusK <- Gen.someOf(0 to 8)
    } yield (docs, corpusD.toSet, corpusK.toSet)
    check(Prop.forAll(genCase) { case (docs, corpusD, corpusK) =>
      def status(exact: Boolean, near: Boolean): String =
        if (exact) "exact" else if (near) "near" else "new"
      // the loop
      var idxD = corpusD; var idxK = corpusK
      val loop = (0 to 3).flatMap { f =>
        val batch = docs.zipWithIndex.filter(_._1._1 == f)
        val out = batch.map { case ((_, d, ks), i) =>
          i -> status(idxD(d), ks.exists(idxK))
        }
        idxD ++= batch.map(_._1._2); idxK ++= batch.flatMap(_._1._3)
        out
      }.toMap
      // the closed form (the oracle's rule)
      val closed = docs.zipWithIndex.map { case ((f, d, ks), i) =>
        val earlier = docs.filter(_._1 < f)
        i -> status(
          corpusD(d) || earlier.exists(_._2 == d),
          ks.exists(k => corpusK(k) || earlier.exists(_._3(k))))
      }.toMap
      loop == closed
    }, "classify-then-absorb")
  }

  test("Spark page() agrees with the pure model on a generated table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (0 until 300).map(i => ((i * 7919) % 40L, i.toLong)) // heavy ts ties
    val df = rows.toDF("ts", "id")
    val model = rows.sortBy(r => (r._1, r._2)).map(_._2)
    for (off <- Seq(0, 37, 150, 295); lim <- Seq(1, 50)) {
      val got = graft.engine.Incremental.page(df, "ts", "id", off, lim)
        .select(col("id")).collect().map(_.getLong(0)).toSeq
      assert(got == model.slice(off, off + lim), s"off=$off lim=$lim")
    }
  }
}
