package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class ConversationsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def turnsDf = Seq(
    // out-of-order input on purpose: assemble must sort by turn_idx
    ("c1", 2, "user", "third", "", ts(30)),
    ("c1", 0, "user", "first", "", ts(10)),
    ("c1", 1, "assistant", "second", "", ts(20)),
    ("c2", 0, "user", "solo", "", ts(100))
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("assemble renders turns in idx order; maxTurns caps state and count") {
    val out = Conversations.assemble(turnsDf).orderBy("conv_id").collect()
    assert(out(0).getAs[String]("doc")
      == "user: first\nassistant: second\nuser: third")
    assert(out(0).getAs[Long]("n_turns") == 3L)
    assert(out(1).getAs[String]("doc") == "user: solo")
    assert(out(1).getAs[Long]("n_turns") == 1L)

    val capped =
      Conversations.assemble(turnsDf, maxTurns = 2).orderBy("conv_id").collect()
    assert(capped(0).getAs[String]("doc") == "user: first\nassistant: second")
    assert(capped(0).getAs[Long]("n_turns") == 2L)
  }

  test("sessionize: strict gap boundary, micro precision, per-key, 0-based") {
    val overBoundary = new Timestamp(201 * 1000L) // 101 s after event 2
    val justAtBoundary = ts(100) // exactly gapSec after event 1
    val ev = Seq(
      (1L, 100L, ts(0)),
      (2L, 100L, justAtBoundary), // gap == gapSec → SAME session (strict >)
      (3L, 100L, overBoundary),   // gap  > gapSec → new session
      (4L, 200L, ts(500))         // other key: its own 0-based counter
    ).toDF("event_id", "user_id", "ts")
    val out = Conversations
      .sessionize(ev, "user_id", "ts", Seq("ts", "event_id"), gapSec = 100L)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L && out(2L) == 0L && out(3L) == 1L && out(4L) == 0L)

    // one microsecond over the boundary must split (integral-us arithmetic)
    val t2 = new Timestamp(100 * 1000L)
    t2.setNanos(1000) // +1 µs
    val ev2 = Seq((1L, 1L, ts(0)), (2L, 1L, t2))
      .toDF("event_id", "user_id", "ts")
    val out2 = Conversations
      .sessionize(ev2, "user_id", "ts", Seq("ts", "event_id"), gapSec = 100L)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out2(2L) == 1L, "1 µs past the gap must open a new session")
  }

  test("stats and composition filter: hand-computed card") {
    val s = Conversations.stats(turnsDf).orderBy("conv_id").collect()
    assert(s(0).getAs[Long]("n_turns") == 3L)
    assert(s(0).getAs[Long]("n_user") == 2L)
    assert(s(0).getAs[Long]("n_assistant") == 1L)
    assert(s(0).getAs[Long]("n_tool") == 0L)
    assert(s(0).getAs[Long]("n_chars") == ("first".length + "second".length
      + "third".length).toLong)
    assert(s(0).getAs[Long]("span_us") == 20L * 1000000L)
    assert(s(1).getAs[Long]("span_us") == 0L)

    val kept = Conversations
      .filterByComposition(turnsDf, minUser = 1L, minAssistant = 1L,
        maxTurns = 10L)
      .as[String].collect().toSet
    assert(kept == Set("c1"), "c2 has no assistant turn")
  }

  test("sftPairs: adjacent user→assistant only, ordered by idx") {
    val df = Seq(
      ("c1", 0, "user", "q1", "", ts(0)),
      ("c1", 1, "assistant", "a1", "", ts(1)),
      ("c1", 2, "user", "q2", "", ts(2)),
      ("c1", 3, "tool", "t1", "bash", ts(3)),   // breaks the pair
      ("c1", 4, "assistant", "a2", "", ts(4)),  // not adjacent to a user
      ("c2", 0, "assistant", "a0", "", ts(0)),  // conversation starts odd
      ("c2", 1, "user", "q3", "", ts(1))        // last turn — no successor
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val pairs = Conversations.sftPairs(df)
      .select($"conv_id", $"prompt_idx", $"prompt", $"completion")
      .as[(String, Int, String, String)].collect().toSet
    assert(pairs == Set(("c1", 0, "q1", "a1")))
  }

  test("tokenQuantiles: hand-computed interpolated percentiles per source") {
    // source A: token counts 1,2,3,4 → p50 = 2.5 (linear interpolation)
    val df = Seq(
      (1L, "w", "A"), (2L, "w w", "A"), (3L, "w w w", "A"),
      (4L, "w w w w", "A"), (5L, "w w", "B")
    ).toDF("doc_id", "text", "source")
    val q = Stats.tokenQuantiles(df).orderBy("source").collect()
    assert(q(0).getAs[Double]("p50") == 2.5)
    assert(q(0).getAs[Double]("p90") == 3.7)   // 1 + 0.9*3 interpolated
    assert(q(1).getAs[Double]("p50") == 2.0)
    assert(q(1).getAs[Double]("p99") == 2.0)
  }

  test("topTerms: exact counts, deterministic count-desc term-asc tie-break") {
    val docs = Seq((1L, "B a"), (2L, "b c a!")).toDF("doc_id", "text")
    val top = Stats.topTerms(docs, k = 2).as[(String, Long)].collect()
    assert(top.toSeq == Seq(("a", 2L), ("b", 2L)),
      s"tie at n=2 must break term-asc: ${top.mkString(",")}")
    val all = Stats.topTerms(docs, k = 10).as[(String, Long)].collect()
    assert(all.toSeq == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }
}
