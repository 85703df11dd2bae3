package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.engine.{Bloom, Exact, Tables}

/** Bloom-pruned join: no false negatives (the exactness precondition),
  * merge = union, useful false-positive rate at design cardinality, the
  * codegen'd membership expression vs the JVM helper, and the end-to-end
  * query vs the plain un-bloomed join. */
class BloomSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.toString)
  }

  test("no false negatives, ever") {
    check(Prop.forAll(Gen.listOf(Gen.long)) { keys =>
      val bits = new Array[Long](Bloom.NumLongs)
      keys.foreach(Bloom.add(bits, _))
      keys.forall(Bloom.contains(bits, _))
    })
  }

  test("merge is bitwise union: membership survives the OR") {
    check(Prop.forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      val a = new Array[Long](Bloom.NumLongs)
      val b = new Array[Long](Bloom.NumLongs)
      xs.foreach(Bloom.add(a, _))
      ys.foreach(Bloom.add(b, _))
      val m = new Bloom.BloomAggregator().merge(a, b)
      (xs ++ ys).forall(Bloom.contains(m, _))
    })
  }

  test("false-positive rate at design cardinality stays well under 1%") {
    val bits = new Array[Long](Bloom.NumLongs)
    (0L until 50000L).foreach(k => Bloom.add(bits, k))
    val fps = (1000000L until 1100000L).count(Bloom.contains(bits, _))
    assert(fps < 1000, s"$fps false positives in 100k disjoint probes")
  }

  test("codegen'd expression agrees with the JVM helper") {
    import spark.implicits._
    val bits = new Array[Long](Bloom.NumLongs)
    (0L until 1000L).foreach(k => Bloom.add(bits, k * 7))
    val df = (0L until 5000L).toDF("k")
    val got = df.withColumn("hit", Bloom.mightContain(col("k"), bits))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until 5000L).foreach { k =>
      assert(got(k) == Bloom.contains(bits, k), s"mismatch at $k")
    }
  }

  test("q_bloom_join equals the plain join, and the bloom actually prunes") {
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
    val plain = Tables.lineitem(spark, sf)
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(unix_micros(date_trunc("month", col("o_orderdate"))).as("month_us"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"),
        Exact.dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("month_us")).collect()
    val bloomed = Bloom.qBloomJoin(spark, sf).collect()
    assert(bloomed.toSeq == plain.toSeq)

    // pruning: rebuild the filter standalone and measure pass-through
    import spark.implicits._
    val bits: Array[Long] = urgent.select(col("o_orderkey").as[Long])
      .select(new Bloom.BloomAggregator().toColumn).head()
    val total = Tables.lineitem(spark, sf).count()
    val kept = Tables.lineitem(spark, sf)
      .filter(Bloom.mightContain(col("l_orderkey"), bits)).count()
    assert(kept < total / 2,
      s"bloom kept $kept of $total — no real pruning at sf0.001")
  }
}
