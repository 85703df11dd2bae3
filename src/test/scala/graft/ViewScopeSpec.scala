package graft

import graft.engine.Relational

/** Temp views behind spark.sql-based queries are scoped per call: a second
  * call at a different sfDir must not redefine the tables under an
  * already-analyzed DataFrame, and the views must not linger in the
  * session catalog. */
class ViewScopeSpec extends SparkSpec {

  test("interleaved sql queries at different sfDirs don't cross-read") {
    val small = Relational.qSubqueryScalar(spark, sf)            // sf0.001
    val big = Relational.qSubqueryScalar(spark, "/root/testdata/sf0.01")
    // collect AFTER both are built — with session-global view names the
    // second call would have repointed the first's tables
    val nSmall = small.count()
    val nBig = big.count()
    assert(nSmall == 150, s"sf0.001 customer count, got $nSmall")
    assert(nBig == 1500, s"sf0.01 customer count, got $nBig")
  }

  test("scoped views are dropped after analysis") {
    Relational.qSqlMultiway(spark, sf).count()
    val leftover = spark.catalog.listTables()
      .filter(t => t.name.startsWith("graft_lineitem") ||
        t.name.startsWith("graft_customer_")).count()
    assert(leftover == 0, s"$leftover scoped views left in the catalog")
  }
}
