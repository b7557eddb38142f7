package graft.alco

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Route-stage invariants, including the hot-conversation regression the
  * design explicitly targets: conversations with turn counts past 2^21
  * (a 21-bit seq field would silently collide there).
  */
class RouteSpec extends SparkSpec {
  import spark.implicits._

  test("seq is unique and strictly monotone in turn_idx past 2^21 turns") {
    // Sparse probe of a 3M-turn conversation: dense band straddling the
    // 2^21 boundary plus a coarse sweep to 3M.
    val boundary = (1 << 21) - 3 to (1 << 21) + 3
    val sweep = 0 until 3000000 by 65537
    val idxs = (boundary ++ sweep).distinct.sorted
    val df = idxs.map(i => ("conv_hot", i)).toDF("conv_id", "turn_idx")
    val seqs = Route.stage(df)
      .orderBy($"turn_idx").select($"seq").as[Long].collect()
    assert(seqs.length == idxs.length)
    assert(seqs.distinct.length == seqs.length, "seq must be unique")
    assert(seqs.zip(seqs.tail).forall { case (a, b) => a < b },
      "seq must be strictly monotone in turn_idx within a conversation")
  }

  test("seq orders turns across conversations deterministically") {
    val df = Seq(("a", 1), ("a", 2), ("b", 1)).toDF("conv_id", "turn_idx")
    val s1 = Route.stage(df).select($"conv_id", $"turn_idx", $"seq").collect().toSet
    val s2 = Route.stage(df).select($"conv_id", $"turn_idx", $"seq").collect().toSet
    assert(s1 == s2, "seq is a pure function of (conv_id, turn_idx)")
    assert(s1.map(_.getLong(2)).size == 3)
  }
}
