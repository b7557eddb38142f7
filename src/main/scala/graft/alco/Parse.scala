package graft.alco

import graft.functions.GrokMatch
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parse stage (SURVEY.md O7/O8/O10/O11): classify each turn's `text`
  * against the compiled grok library and extract structured fields, all as
  * codegen'd Catalyst expressions. Reference analog: alco's `json.loads` +
  * timestamp split in Collector.process_message [PK]; here the "wire format"
  * is the transcript text grammar of FIXTURES.md §2.
  *
  * Each pattern is matched ONCE per row via the custom `GrokMatch`
  * expression, which returns a struct of all capture groups (round-3
  * verdict: the previous rlike + N×regexp_extract pile evaluated P1 up to 6×
  * per row and its generated code blew Janino's 64 KB method limit, silently
  * dropping the fused flagship plans to interpreted execution). classify
  * carries the match structs forward in internal `__g1`/`__g2` columns so
  * the fused classify→extract shape never re-matches; the batch pipeline
  * drops them before its dedup shuffle (narrow shuffle rows) and extract
  * recomputes them once per SURVIVING row.
  *
  * Rows matching no pattern are NOT dropped: `pattern_id = 0` marks them for
  * the quarantine path, counted in the audit table (alco logs malformed
  * messages [PK, medium]). Rows with missing routing metadata (null role /
  * empty role / null ts) are quarantined the same way when those columns are
  * present: a null day or role would partition to
  * __HIVE_DEFAULT_PARTITION__ while the manifest names the coalesced key,
  * and the orphan cleanup would then delete the committed files (ADVICE r3,
  * medium).
  */
object Parse {

  // The compiled pattern library. P3 is the constrained free-text fallback:
  // anything that *looks* like a tool call/result but fails P1/P2 is
  // malformed → quarantine. (RE2-safe: no lookaheads; CALL/RESULT exclusion
  // is handled by the when() dispatch order below.)
  // args must match the flat string-map grammar (FLATMAP) exactly: a
  // contract-valid-looking CALL with e.g. a non-string value (args={"n":3})
  // classifies as quarantine rather than reaching the attrs extractor with
  // mismatched key/value arrays (which would throw and kill the batch).
  val P1: Grok.Compiled = Grok.compile("tool_call",
    """^CALL %{WORD:called_tool} args=\{%{FLATMAP:args_json}\} dur_ms=%{INT:dur_ms}$""")
  val P2: Grok.Compiled = Grok.compile("tool_result",
    """^RESULT status=%{WORD:status} bytes=%{INT:bytes} msg=%{GREEDYDATA:msg}$""")
  val P3: Grok.Compiled = Grok.compile("chat_text", """^%{GREEDYDATA:free}$""")

  val patterns: Seq[Grok.Compiled] = Seq(P1, P2, P3)

  /** Internal single-pass match-struct columns added by `classify` and
    * consumed (and dropped) by `extract`. The batch pipeline drops them
    * before the dedup shuffle via this list.
    */
  val matchCols: Seq[String] = Seq("__g1", "__g2")
  private val G1 = matchCols(0)
  private val G2 = matchCols(1)

  private val attrsType = MapType(StringType, StringType)

  private def grok(c: Column, p: Grok.Compiled): Column =
    GrokMatch.grok_match(c, p.regex, p.fields)

  /** Flat string-valued JSON object body (`"k":"v",…` without the braces)
    * → map<string,string>, as pure codegen'd expressions. `from_json`
    * (JsonToStructs) is a CodegenFallback and knocks the whole extract
    * projection out of WholeStageCodegen (caught by PlanSpec); the alco
    * `js` attribute analog is a flat string map, so regexp extraction is
    * exact here. Values with embedded escaped quotes would need the
    * from_json path — quarantine-bound inputs never reach this expression.
    */
  private def flatJsonToMap(body: Column): Column = {
    val keys = regexp_extract_all(body, lit("\"([^\"]+)\"\\s*:"), lit(1))
    val vals = regexp_extract_all(body, lit(":\\s*\"([^\"]*)\""), lit(1))
    // P1's FLATMAP grammar guarantees |keys| == |vals|; the guards make a
    // regression (or a future looser pattern) degrade to a null attrs map
    // instead of a job-killing map_from_arrays length/duplicate-key error.
    when(size(keys) === size(vals) &&
        size(keys) === size(array_distinct(keys)),
      map_from_arrays(keys, vals))
  }

  /** Pattern classification: pattern_id int (1/2/3, 0 = quarantine), plus
    * the `__g1`/`__g2` match structs (each pattern matched once). Split from
    * `extract` so the REPLACE-dedup shuffle can run between them and carry
    * only flat narrow columns — field extraction happens once per SURVIVING
    * row, after dedup (the pipeline drops `matchCols` before the shuffle).
    */
  def classify(df: DataFrame): DataFrame = {
    val t = col("text")
    val looksStructured = t.startsWith("CALL") || t.startsWith("RESULT")
    // Routing-metadata completeness is part of well-formedness, but only
    // when the caller's frame carries the metadata columns (text-only frames
    // in specs classify on text alone).
    val metaOk: Column =
      if (Seq("role", "ts").forall(df.columns.contains))
        col("role").isNotNull && col("role") =!= "" && col("ts").isNotNull
      else lit(true)
    // P3 acceptance is an EXPLICIT rule, not a regex: non-structured,
    // non-empty, single-line. Java's `$` matches before a trailing newline
    // while RE2's does not, so a P3 regex could never be mirrored exactly by
    // a DuckDB oracle — `contains \n` is engine-neutral and is restated
    // verbatim in SparkEntry.duckOk (ADVICE r2).
    df.withColumn(G1, grok(t, P1))
      .withColumn(G2, grok(t, P2))
      .withColumn("pattern_id",
        when(!metaOk, lit(0))
          .when(col(G1).isNotNull, lit(1))
          .when(col(G2).isNotNull, lit(2))
          .when(!looksStructured && length(t) > 0 && !t.contains("\n"), lit(3))
          .otherwise(lit(0)))
  }

  /** Field extraction for classified rows: called_tool, dur_ms int, status,
    * bytes long, attrs map<string,string> (alco `js` analog), and `day`
    * (UTC event-time day, the shard-routing key — alco D4). Reuses the
    * classify match structs when present (fused query-surface shape);
    * recomputes them once otherwise (post-dedup pipeline shape). Drops the
    * internal structs either way.
    */
  def extract(df: DataFrame): DataFrame = {
    val t = col("text")
    val withG = Seq(G1 -> P1, G2 -> P2).foldLeft(df) { case (d, (g, p)) =>
      if (d.columns.contains(g)) d else d.withColumn(g, grok(t, p))
    }
    def g1(field: String): Column = col(s"$G1.$field")
    def g2(field: String): Column = col(s"$G2.$field")
    withG
      .withColumn("called_tool",
        when(col("pattern_id") === 1, g1("called_tool")))
      .withColumn("dur_ms",
        when(col("pattern_id") === 1, g1("dur_ms").cast(IntegerType)))
      .withColumn("status",
        when(col("pattern_id") === 2, g2("status")))
      .withColumn("bytes",
        when(col("pattern_id") === 2, g2("bytes").cast(LongType)))
      .withColumn("attrs",
        when(col("pattern_id") === 1, flatJsonToMap(g1("args_json")))
          .when(col("pattern_id") === 2,
            map(lit("msg"), g2("msg")))
          .otherwise(map().cast(attrsType)))
      .withColumn("day", to_date(col("ts")))
      .drop(matchCols: _*)
  }

  /** classify + extract in one projection chain (the single-pass shape used
    * by the query surface and streaming; the batch pipeline interleaves the
    * dedup shuffle between the two). The match structs flow from classify
    * straight into extract, so each pattern is matched exactly once per row.
    */
  def stage(df: DataFrame): DataFrame = extract(classify(df))

  /** Quarantine split: (wellFormed, quarantined). */
  def splitQuarantine(parsed: DataFrame): (DataFrame, DataFrame) =
    (parsed.filter(col("pattern_id") =!= 0), parsed.filter(col("pattern_id") === 0))
}
