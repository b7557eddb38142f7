package graft.alco

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** alco LoggerColumn semantics (D3): each role flag must observably drive
  * engine behavior — `excluded` drops the stored column, `filtered` selects
  * the distinct-value rollup columns, `display` the grep projection,
  * `context` the context-window grouping key.
  */
class ColumnRoleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val turns = Gen.turns(spark, 5000L).toDF()

  private def rolesWith(f: ColumnRole => ColumnRole): Seq[ColumnRole] =
    Pipeline.defaultRoles.map(f)

  test("excluded column is parsed but not stored") {
    val out = tmpDir("roles_excl")
    val roles = rolesWith(r => if (r.name == "attrs") r.copy(excluded = true) else r)
    Pipeline.run(spark, turns, out, Pipeline.Config(columnRoles = roles))
    val stored = spark.read.parquet(s"$out/routed").columns.toSet
    assert(!stored.contains("attrs"), "excluded column must not be written")
    assert(stored.contains("text") && stored.contains("conv_id"))
  }

  test("key/partition columns cannot be excluded") {
    val roles = rolesWith(r => if (r.name == "ts") r.copy(excluded = true) else r)
    assert(Pipeline.Config(columnRoles = roles).writeColumns.contains("ts"))
  }

  test("filtered flags select the distinct-rollup columns") {
    val out = tmpDir("roles_filt")
    val roles = rolesWith {
      case r if r.name == "status" => r.copy(filtered = false)
      case r if r.name == "tool" => r.copy(filtered = true)
      case r => r
    }
    Pipeline.run(spark, turns, out, Pipeline.Config(columnRoles = roles))
    val cols = spark.read.parquet(s"$out/distinct_sets_batch_0")
      .select($"column").distinct().as[String].collect().toSet
    assert(cols.contains("tool") && !cols.contains("status"),
      s"distinct sets must follow the filtered flags, got $cols")
  }

  test("display flags drive the grep projection") {
    val out = tmpDir("roles_disp")
    Pipeline.run(spark, turns, out, Pipeline.Config())
    val q = Grep.Query(limit = 5, roles = Some(Pipeline.defaultRoles))
    val got = Grep.query(spark, s"$out/routed", q)
    val display = Pipeline.defaultRoles.filter(r => r.display && !r.excluded)
      .map(_.name).toSet
    assert(got.columns.toSet.subsetOf(display + "tool_key"))
    assert(!got.columns.contains("seq"), "seq is display=false")
    assert(got.count() == 5)
  }

  test("context flags drive the neighbor-window grouping") {
    val df = Seq(
      ("c1", 0, "user", "a"), ("c1", 1, "user", "b"),
      ("c2", 0, "user", "x"), ("c2", 1, "tool", "y"))
      .toDF("conv_id", "turn_idx", "role", "text")
    // default context = conv_id: c1/0's next is b
    val byConv = Grep.withNeighbors(df)
      .filter($"conv_id" === "c1" && $"turn_idx" === 0)
      .select($"next_text").as[String].head()
    assert(byConv == "b")
    // context = role: user stream is (a, b, x) ordered by turn_idx with ties
    // broken arbitrarily — assert grouping changed by checking y's group:
    // under role-context, c2/1 (role=tool) has NO neighbors.
    val roleCtx = Seq(ColumnRole("role", context = true))
    val toolRow = Grep.withNeighbors(df, roles = roleCtx)
      .filter($"role" === "tool")
      .select($"prev_text", $"next_text").head()
    assert(toolRow.isNullAt(0) && toolRow.isNullAt(1),
      "sole row of its context group must have no neighbors")
  }
}
