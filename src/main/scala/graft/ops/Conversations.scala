package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-level curation operators — the bridge between the alco
  * transcripts table (one row per turn) and the document-level
  * training-data ops: render whole conversations into training documents,
  * split activity streams into sessions, and compute per-conversation
  * composition signals for filtering.
  *
  * Scale posture (10^12 turns): every operator here is ONE hash shuffle on
  * the conversation/user key. Per-key state is bounded by the single
  * conversation's (capped) turn count — inherent to sequence semantics; a
  * conversation that must be rendered in order must be co-located. The
  * planted hot conversation (Gen.turns: one conv_id holds ~30% of turns)
  * is the skew case: `assemble` bounds it with `maxTurns` BEFORE the
  * shuffle (a scan-pushed filter), `sessionize`/`stats` keep only
  * constant-width running state per row and never materialize the group.
  */
object Conversations {

  /** Render each conversation into one ordered training document:
    * `role: text` lines joined by `sep`, turns ordered by `idxCol`.
    *
    * `maxTurns` caps the per-conversation state at the scan (turns with
    * `idxCol >= maxTurns` are dropped before the shuffle, so the hot
    * conversation can never OOM an executor); `n_turns` counts the turns
    * actually rendered. Ordering happens AFTER collection via
    * `array_sort` on (idx, role, text) structs — no per-group sort
    * exchange, one ObjectHashAggregate.
    */
  def assemble(df: DataFrame, maxTurns: Int = Int.MaxValue,
      convCol: String = "conv_id", idxCol: String = "turn_idx",
      roleCol: String = "role", textCol: String = "text",
      sep: String = "\n"): DataFrame = {
    require(maxTurns >= 1, "maxTurns must be >= 1")
    val capped =
      if (maxTurns == Int.MaxValue) df else df.filter(col(idxCol) < maxTurns)
    capped
      .groupBy(col(convCol))
      .agg(collect_list(struct(col(idxCol), col(roleCol), col(textCol)))
        .as("_turns"))
      .select(col(convCol),
        size(col("_turns")).cast("long").as("n_turns"),
        array_join(
          transform(array_sort(col("_turns")),
            t => concat(t.getField(roleCol), lit(": "), t.getField(textCol))),
          sep).as("doc"))
  }

  /** Time-gap sessionization: assign a 0-based `session_idx` per `keyCol`,
    * incremented whenever the gap to the previous row (in `orderCols`
    * order) exceeds `gapSec`. The classic log/event sessionizer, applied
    * to transcripts (key = conv_id) or activity streams (key = user_id).
    *
    * Gap arithmetic is integral microseconds (`unix_micros`) so the DuckDB
    * oracle (`epoch_us`) replays it bit-exactly — no float seconds, no
    * truncation skew at the boundary. Both window functions share one
    * (partition, order) spec → a single exchange + per-key sort; running
    * state is one counter per key.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      orderCols: Seq[String], gapSec: Long): DataFrame = {
    require(gapSec >= 0, "gapSec must be >= 0")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    // external parquet may carry TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
    // (identity at the session's UTC zone, ≡ DuckDB epoch_us of the naive ts)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val prevUs = lag(us, 1).over(w)
    val boundary =
      when(prevUs.isNull || (us - prevUs) > gapSec * 1000000L, 1L)
        .otherwise(0L)
    df.withColumn("session_idx",
      sum(boundary)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - 1L)
  }

  /** Per-conversation composition data card: turn counts by role, total
    * text chars, and the conversation's time span in microseconds. The
    * filtering signal for SFT curation (drop conversations with no
    * assistant turns, absurd spans, degenerate role mixes) — one hash
    * aggregate, constant state per conversation.
    */
  def stats(df: DataFrame, convCol: String = "conv_id",
      roleCol: String = "role", textCol: String = "text",
      tsCol: String = "ts"): DataFrame = {
    def roleCount(r: String): Column =
      sum(when(col(roleCol) === r, 1L).otherwise(0L))
    df.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        roleCount("user").as("n_user"),
        roleCount("assistant").as("n_assistant"),
        roleCount("tool").as("n_tool"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        (unix_micros(max(col(tsCol)).cast("timestamp"))
          - unix_micros(min(col(tsCol)).cast("timestamp"))).as("span_us"))
  }

  /** SFT pair mining: emit (prompt, completion) rows for every
    * `userRole` turn immediately followed (in `idxCol` order) by an
    * `assistantRole` turn — the canonical instruction-tuning extraction
    * over raw transcripts. Both `lead` calls share one (conv, idx) window
    * spec → a single exchange + per-conversation sort, state one row deep.
    */
  def sftPairs(df: DataFrame, convCol: String = "conv_id",
      idxCol: String = "turn_idx", roleCol: String = "role",
      textCol: String = "text", userRole: String = "user",
      assistantRole: String = "assistant"): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
    df.select(col(convCol), col(idxCol), col(roleCol), col(textCol),
        lead(col(roleCol), 1).over(w).as("_next_role"),
        lead(col(textCol), 1).over(w).as("_next_text"))
      .filter(col(roleCol) === userRole && col("_next_role") === assistantRole)
      .select(col(convCol), col(idxCol).as("prompt_idx"),
        col(textCol).as("prompt"), col("_next_text").as("completion"))
  }

  /** Composition filter over `stats`: keep conversations with at least
    * `minUser` user and `minAssistant` assistant turns and at most
    * `maxTurns` turns total. Returns the surviving conv keys (semi-joinable
    * back against the turns at zero extra text movement).
    */
  def filterByComposition(df: DataFrame, minUser: Long, minAssistant: Long,
      maxTurns: Long, convCol: String = "conv_id"): DataFrame =
    stats(df, convCol)
      .filter(col("n_user") >= minUser && col("n_assistant") >= minAssistant
        && col("n_turns") <= maxTurns)
      .select(col(convCol))
}
