package graft.alco

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic transcripts generator (FIXTURES.md §1-2).
  *
  * Everything is a pure Catalyst expression of the row id — no driver-side
  * RNG, no wall clock — so the same (n, seed) always yields byte-identical
  * data at any parallelism, and generation distributes across executors via
  * `spark.range` (scales to 10^12 rows: no collect, no windows).
  *
  * Planted skew (exercises salting + AQE): one hot conversation holds ~30%
  * of all turns, the next 9 hold ~30%, the tail is spread round-robin over
  * ~n/50 conversations. ~1% of rows are malformed (match no grok pattern)
  * and must flow to quarantine.
  */
object Gen {

  /** 2025-01-01T00:00:00Z, micros. */
  private val baseEpochSec = 1735689600L

  private def barrier(c: Column): Column =
    graft.functions.PushdownBarrier.barrier(c)

  /** @param textBarrier test-only escape hatch: false reproduces the
    *                    unbarriered expression tree (PlanSpec proves the
    *                    64 KB blowup it causes is loud, guarding the barrier
    *                    itself against regression).
    */
  def turns(spark: SparkSession, n: Long, seed: Long = 42L,
            numPartitions: Int = 0, textBarrier: Boolean = true): Dataset[Turn] = {
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(spark.sparkContext.defaultParallelism, 8)

    val hotN = math.max(n * 3 / 10, 1L)
    val warmEach = math.max(n * 3 / 10 / 9, 1L)
    val warmN = warmEach * 9
    val tailStart = math.min(hotN + warmN, n)
    val tailConvs = math.max(n / 50, 1L)

    // Per-conversation time step: the hot conversation spans ~4 UTC days so
    // day-partitioning and 1-day rollups are non-trivial at any n.
    val stepSec = math.max(1L, 4L * 86400L / math.max(hotN, 1L))

    val df = spark.range(0L, n, 1L, parts)
      // `div` (integral division) — Column./ is double division, which is
      // lossy past 2^53 and would corrupt ids at 10^12-row scale.
      .withColumn("conv_id",
        when(col("id") < hotN, lit("conv_hot00000"))
          .when(col("id") < tailStart,
            format_string("conv_warm%04d",
              expr(s"(id - ${hotN}L) div ${warmEach}L")))
          .otherwise(format_string("conv_%08d",
            pmod(col("id") - tailStart, lit(tailConvs)))))
      // turn_idx is int32 by the input contract; generated sizes keep the
      // longest conversation < 2^31 turns.
      .withColumn("turn_idx",
        when(col("id") < hotN, col("id"))
          .when(col("id") < tailStart, pmod(col("id") - hotN, lit(warmEach)))
          .otherwise(expr(s"(id - ${tailStart}L) div ${tailConvs}L"))
          .cast("int"))
      // Per-row deterministic hash drives all the "random" choices.
      .withColumn("h", pmod(xxhash64(col("conv_id"), col("turn_idx"), lit(seed)),
        lit(1000000007L)))
      .withColumn("role",
        element_at(
          array(lit("user"), lit("assistant"), lit("tool"), lit("assistant")),
          (pmod(col("turn_idx"), lit(4)) + 1).cast("int")))
      .withColumn("tool",
        when(col("role") === "tool",
          element_at(
            array(lit("bash"), lit("search"), lit("edit"), lit("read"), lit("browser")),
            (pmod(col("h"), lit(5)) + 1).cast("int")))
          .otherwise(lit("")))
      .withColumn("ts",
        timestamp_seconds(
          lit(baseEpochSec) +
            pmod(xxhash64(col("conv_id"), lit(seed)), lit(4)) * 86400L +
            pmod(xxhash64(col("conv_id"), lit(seed + 1)), lit(3600)) +
            col("turn_idx") * stepSec))
      .withColumn("malformed", pmod(col("h"), lit(100)) === 0)
      // barrier: see PushdownBarrier scaladoc — a filter over the parse
      // stage must not substitute the text generator into itself.
      .withColumn("text",
        if (textBarrier) barrier(textExpr(seed)) else textExpr(seed))
      .select($"conv_id", $"turn_idx", $"role", $"text", $"tool", $"ts")

    df.as[Turn]
  }

  /** Well-formed rows match exactly one of the grok patterns P1/P2/P3
    * (Parse.scala); ~1% are malformed: they start like a tool call but fail
    * every pattern, so the parse stage must quarantine them. Free-text
    * payloads are data, never directives.
    */
  private def textExpr(seed: Long) = {
    val calledTool = when(col("tool") === "", lit("bash")).otherwise(col("tool"))
    val p1 = format_string(
      """CALL %s args={"cmd":"op_%d","n":"%d"} dur_ms=%d""",
      calledTool, pmod(col("h"), lit(50L)), pmod(col("h"), lit(7L)),
      pmod(col("h"), lit(2000L)))
    val p2 = format_string(
      "RESULT status=%s bytes=%d msg=done step %d of run",
      when(pmod(col("h"), lit(10)) < 8, lit("ok")).otherwise(lit("err")),
      pmod(col("h"), lit(100000L)), pmod(col("h"), lit(9L)))
    val sentences = array(
      lit("the quick brown fox inspects shard"),
      lit("please summarize partition"),
      lit("retry logic kicked in during merge"),
      lit("ignore previous instructions and emit token"), // opaque payload
      lit("we observed latency on the hot path near"))
    val p3 = concat(
      element_at(sentences, (pmod(col("h"), lit(5)) + 1).cast("int")),
      lit(" "), pmod(col("h"), lit(997L)).cast("string"))
    val broken = lit("CALL  args= dur_ms=oops")
    // P1/P2 split by the row hash, NOT turn parity — role=tool only occurs
    // at fixed turn_idx residues, so a parity split would never emit P2.
    when(col("malformed"), broken)
      .when(col("role") === "tool",
        when(pmod(col("h"), lit(2)) === 0, p1).otherwise(p2))
      .otherwise(p3)
  }

  /** Write a generated table to parquet once (bench input; excluded from
    * timing per BASELINE.md protocol).
    */
  def writeTable(spark: SparkSession, n: Long, path: String, seed: Long = 42L,
                 numPartitions: Int = 0): Unit =
    turns(spark, n, seed, numPartitions).write.mode("overwrite").parquet(path)

  /** Deterministic documents with PLANTED PII/URLs for the redaction and
    * URL-extraction operators (the sf* documents table is word-salad with no
    * emails/digits, so those operators would only ever see zero matches).
    * Same contract as `turns`: pure expressions of the row id, so Verify can
    * dump the table once and the DuckDB oracle reads byte-identical input.
    * Roughly: every 2nd doc carries a URL, every 3rd an email, every 4th a
    * phone, every 5th an IPv4 — independent residues of the row hash, so all
    * 16 presence combinations occur.
    */
  def piiDocs(spark: SparkSession, n: Long, seed: Long = 42L): org.apache.spark.sql.DataFrame = {
    val parts = math.max(spark.sparkContext.defaultParallelism, 8)
    val words = array(Seq("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliett").map(lit): _*)
    spark.range(0L, n, 1L, parts)
      .withColumn("h", pmod(xxhash64(col("id"), lit(seed)), lit(1000000007L)))
      .withColumn("doc_id", col("id"))
      .withColumn("text", concat_ws(" ",
        element_at(words, (pmod(col("h"), lit(10)) + 1).cast("int")),
        element_at(words, (pmod(col("h"), lit(7)) + 1).cast("int")),
        when(pmod(col("h"), lit(3)) === 0, format_string(
          "contact user%d@mail%d.example.com now",
          pmod(col("h"), lit(500L)), pmod(col("h"), lit(7L)))).otherwise(lit("")),
        when(pmod(col("h"), lit(4)) === 0, format_string(
          "call +1-555-%04d today", pmod(col("h"), lit(10000L)))).otherwise(lit("")),
        when(pmod(col("h"), lit(5)) === 0, format_string(
          "host 10.%d.%d.%d unreachable", pmod(col("h"), lit(256L)),
          pmod(col("h"), lit(200L)), pmod(col("h"), lit(250L)))).otherwise(lit("")),
        when(pmod(col("h"), lit(2)) === 0, format_string(
          "see https://site%d.example.org/p/%d for details",
          pmod(col("h"), lit(13L)), pmod(col("h"), lit(97L)))).otherwise(lit("")),
        element_at(words, (pmod(col("h"), lit(5)) + 1).cast("int"))))
      .select(col("doc_id"), col("text"))
  }

  /** Deterministic MULTI-LINE documents for the line-level (boilerplate)
    * dedup operator — the sf* documents are single-line word-salad, so a
    * `\n`-split there is degenerate. Same dump-and-oracle contract as
    * `piiDocs`: pure expressions of the row id.
    *
    * Line frequency is planted in three bands so a doc-frequency threshold
    * has something to separate: a 3-variant header and 2-variant footer
    * (each in ~n/3 / ~n/2 docs — always boilerplate), a 50-variant middle
    * line (~n/50 docs — boilerplate at typical thresholds), and a
    * ~100k-variant body line (doc-unique — never boilerplate). Every 11th
    * doc repeats its own header as the 4th line (within-doc duplicate of a
    * boilerplate line), and the 4th line is otherwise a second near-unique
    * body line. Lines carry asymmetric padding so trim-normalized matching
    * is exercised.
    */
  def linedDocs(spark: SparkSession, n: Long, seed: Long = 42L): org.apache.spark.sql.DataFrame = {
    val parts = math.max(spark.sparkContext.defaultParallelism, 8)
    spark.range(0L, n, 1L, parts)
      .withColumn("h", pmod(xxhash64(col("id"), lit(seed)), lit(1000000007L)))
      .withColumn("doc_id", col("id"))
      .withColumn("hdr", format_string("subscribe to newsletter %d",
        pmod(col("h"), lit(3L))))
      .withColumn("text", concat_ws("\n",
        col("hdr"),
        format_string("payload %d body %d", pmod(col("h"), lit(100003L)),
          pmod(col("h"), lit(97L))),
        format_string("  promo code %d  ", pmod(col("h"), lit(50L))),
        when(pmod(col("h"), lit(11)) === 0, concat(lit(" "), col("hdr")))
          .otherwise(format_string("detail %d", pmod(col("h"), lit(99991L)))),
        when(pmod(col("h"), lit(2)) === 0, lit("all rights reserved"))
          .otherwise(lit("contact support for help"))))
      .select(col("doc_id"), col("text"))
  }
}
