package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Proves the round-3 crash-isolation contract of the driver correctness
  * gate: one pathological query (hang OR throw) costs exactly its own row —
  * oracle_sql.json and every other query's dump survive. (Round 2 lost all
  * 42 signals to a single planning blowup.)
  */
class VerifySpec extends SparkSpec {

  test("a hanging query is watchdog-skipped; other dumps and oracle json survive") {
    val out = tmpDir("verify_isolation")
    Verify.writeOracleJson(out, Map("good" -> "SELECT 1 AS x \t\"quoted\""))
    assert(Files.exists(Paths.get(s"$out/oracle_sql.json")),
      "oracle json must exist BEFORE any query runs")

    val queries = Map[String, (SparkSession, String) => DataFrame](
      "a_good" -> ((s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }),
      "b_hang" -> ((s, _) => {
        import s.implicits._
        // a genuinely running Spark job that outlives the budget: each row
        // sleeps, cancellation via job group must unstick the loop
        s.range(0, 64, 1, 8).map { i => Thread.sleep(2000); i }.toDF("x")
      }),
      "c_throws" -> ((s, _) => { import s.implicits._
        Seq(1).toDF("x").filter(raise_error(lit("boom")) === lit(true)) }),
      "d_also_good" -> ((s, _) => { import s.implicits._; Seq(4).toDF("y") }))

    val t0 = System.nanoTime()
    val (ok, bad) = Verify.dumpAll(spark, "unused", out, queries, budgetSec = 5)
    val wallSec = (System.nanoTime() - t0) / 1e9

    assert(ok.toSet == Set("a_good", "d_also_good"), s"ok=$ok bad=$bad")
    assert(bad.toSet == Set("b_hang", "c_throws"))
    assert(Files.exists(Paths.get(s"$out/a_good")) &&
      Files.exists(Paths.get(s"$out/d_also_good")))
    // failed/timed-out dumps are scrubbed — the driver compare must never
    // read a partial parquet dir as a (garbage) result (ADVICE r3)
    assert(!Files.exists(Paths.get(s"$out/b_hang")) &&
      !Files.exists(Paths.get(s"$out/c_throws")),
      "bad-query dump dirs must be deleted")
    // the hang cost ~budget, not the 128 s the job would have taken
    assert(wallSec < 60, s"watchdog must bound the loop (took $wallSec s)")
    // the json survived the whole episode and is valid for the driver
    val json = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    assert(json.contains("\\t") && json.contains("\\\""), "control chars escaped")
  }
}
