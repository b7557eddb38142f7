package graft.alco

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parse stage (SURVEY.md O7/O8/O10/O11): classify each turn's `text`
  * against the compiled grok library and extract structured fields, all as
  * codegen'd Catalyst expressions (`rlike` / `regexp_extract` / `from_json`).
  * Reference analog: alco's `json.loads` + timestamp split in
  * Collector.process_message [PK]; here the "wire format" is the transcript
  * text grammar of FIXTURES.md §2.
  *
  * Rows matching no pattern are NOT dropped: `pattern_id = 0` marks them for
  * the quarantine path, counted in the audit table (alco logs malformed
  * messages [PK, medium]).
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

  private val attrsType = MapType(StringType, StringType)

  private def ext(c: Column, p: Grok.Compiled, field: String): Column =
    regexp_extract(c, p.regex, p.groupOf(field))

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

  /** Pattern classification only: pattern_id int (1/2/3, 0 = quarantine).
    * Split from `extract` so the REPLACE-dedup shuffle can run between them
    * and carry only flat narrow columns — field extraction (regex groups,
    * the attrs map) happens once per SURVIVING row, after dedup.
    */
  def classify(df: DataFrame): DataFrame = {
    val t = col("text")
    val looksStructured = t.startsWith("CALL") || t.startsWith("RESULT")
    // P3 acceptance is an EXPLICIT rule, not a regex: non-structured,
    // non-empty, single-line. Java's `$` matches before a trailing newline
    // while RE2's does not, so `rlike(P3.regex)` could never be mirrored
    // exactly by a DuckDB oracle — `contains \n` is engine-neutral and is
    // restated verbatim in SparkEntry.duckOk (ADVICE r2).
    df.withColumn("pattern_id",
      when(t.rlike(P1.regex), lit(1))
        .when(t.rlike(P2.regex), lit(2))
        .when(!looksStructured && length(t) > 0 && !t.contains("\n"), lit(3))
        .otherwise(lit(0)))
  }

  /** Field extraction for classified rows: called_tool, dur_ms int, status,
    * bytes long, attrs map<string,string> (alco `js` analog), and `day`
    * (UTC event-time day, the shard-routing key — alco D4).
    */
  def extract(df: DataFrame): DataFrame = {
    val t = col("text")
    df.withColumn("called_tool",
        when(col("pattern_id") === 1, ext(t, P1, "called_tool")))
      .withColumn("dur_ms",
        when(col("pattern_id") === 1, ext(t, P1, "dur_ms").cast(IntegerType)))
      .withColumn("status",
        when(col("pattern_id") === 2, ext(t, P2, "status")))
      .withColumn("bytes",
        when(col("pattern_id") === 2, ext(t, P2, "bytes").cast(LongType)))
      .withColumn("attrs",
        when(col("pattern_id") === 1, flatJsonToMap(ext(t, P1, "args_json")))
          .when(col("pattern_id") === 2,
            map(lit("msg"), ext(t, P2, "msg")))
          .otherwise(map().cast(attrsType)))
      .withColumn("day", to_date(col("ts")))
  }

  /** classify + extract in one projection (the single-pass shape used by
    * the query surface and streaming; the batch pipeline interleaves the
    * dedup shuffle between the two).
    */
  def stage(df: DataFrame): DataFrame = extract(classify(df))

  /** Quarantine split: (wellFormed, quarantined). */
  def splitQuarantine(parsed: DataFrame): (DataFrame, DataFrame) =
    (parsed.filter(col("pattern_id") =!= 0), parsed.filter(col("pattern_id") === 0))
}
