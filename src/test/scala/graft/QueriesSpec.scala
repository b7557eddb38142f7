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

  test("oracle SQL carries no control characters (escape-processing trap)") {
    // `s"""…"""` INTERPOLATED strings process \b/\f escapes even in triple
    // quotes (plain """…""" strings don't) — a regex word boundary written
    // \b in the wrong string kind silently becomes a BACKSPACE byte, the
    // oracle matches nothing, and only the DuckDB gate would notice.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val ctl = sql.filter(c => c < ' ' && c != '\n')
      assert(ctl.isEmpty,
        s"$name oracle contains control bytes ${ctl.map(_.toInt).toSeq}")
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, dir).count()
      assert(n >= 0)
    }
  }

  test("q49 approx distinct tracks q12 exact within the configured rsd") {
    val exact = SparkEntry.queries("q12_count_distinct")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q49_approx_distinct")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      assert(math.abs(a - n) <= math.max(2.0, n * 0.1),
        s"$k: approx $a vs exact $n")
    }
  }
}
