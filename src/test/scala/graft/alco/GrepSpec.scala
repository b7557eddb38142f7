package graft.alco

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GrepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = tmpDir("grep")
  private lazy val routedPath = {
    val turns = Gen.turns(spark, 10000L)
    Pipeline.run(spark, turns.toDF(), out, Pipeline.Config())
    s"$out/routed"
  }

  test("token OR / AND / phrase match semantics") {
    val df = spark.read.parquet(routedPath)
    val any = df.filter(Grep.matchPredicate(Seq("retry", "latency"), Grep.MatchAny)).count()
    val all = df.filter(Grep.matchPredicate(Seq("retry", "merge"), Grep.MatchAll)).count()
    val phrase = df.filter(Grep.matchPredicate(Seq("retry", "logic"), Grep.MatchPhrase)).count()
    assert(any > 0 && all > 0 && phrase > 0)
    assert(all <= df.filter(Grep.matchPredicate(Seq("retry"), Grep.MatchAny)).count())
    // phrase ⊆ AND of its terms
    assert(phrase <= all)
  }

  test("quorum match requires at least k of the terms") {
    val df = Seq(
      (1L, "spark and vector and table all here"),   // 3 of 3
      (2L, "spark with a table"),                    // 2 of 3
      (3L, "only spark present"),                    // 1 of 3
      (4L, "none of them")).toDF("id", "text")
    val hits = df.filter(Grep.matchPredicate(Seq("spark", "vector", "table"),
      Grep.MatchQuorum(2))).select($"id").as[Long].collect().toSet
    assert(hits == Set(1L, 2L), s"got $hits")
    // k <= 0 degenerates to match-everything (Sphinx quorum edge; the
    // r6 TermsMatch rewrite must keep the degeneracy, review finding)
    val all = df.filter(Grep.matchPredicate(Seq("spark", "vector"),
      Grep.MatchQuorum(0))).count()
    assert(all == 4L, s"quorum 0 must match every row, got $all")
  }

  test("proximity match requires all terms within the token span, any order") {
    val df = Seq(
      (1L, "table near spark"),                          // span 3, reversed
      (2L, "spark engine writes a table"),               // span 5 > 4
      (3L, "a spark in my table today"),                 // span 4
      (4L, "spark only"),                                // missing term
      (5L, ", spark, table!")).toDF("id", "text")        // punctuation noise
    val hits = df.filter(Grep.matchPredicate(Seq("spark", "table"),
      Grep.MatchProximity(4))).select($"id").as[Long].collect().toSet
    assert(hits == Set(1L, 3L, 5L), s"got $hits")
  }

  test("phrase match is token-boundary, not substring (Sphinx semantics)") {
    val df = Seq(
      (1L, "we added retry logic for timeouts"),
      (2L, "the retry logical operator is unrelated"),   // prefix-extends term 2
      (3L, "faretry logic here"),                        // prefix-extends term 1
      (4L, "Retry   logic, with punctuation: ok"),       // case + multi-space + punct
      (5L, "logic retry (reversed order)")).toDF("id", "text")
    val hits = df.filter(Grep.matchPredicate(Seq("retry", "logic"), Grep.MatchPhrase))
      .select($"id").as[Long].collect().toSet
    assert(hits == Set(1L, 4L), s"got $hits")
  }

  test("attribute IN filters + ordering + limit") {
    val q = Grep.Query(terms = Seq("retry"), filters = Map("role" -> Seq("user", "assistant")),
      limit = 10)
    val rows = Grep.query(spark, routedPath, q).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val ts = rows.map(_.getAs[java.sql.Timestamp]("ts").getTime)
    assert(ts.sameElements(ts.sortBy(-_: Long)), "newest first")
  }

  test("offset pagination is stable and non-overlapping") {
    val base = Grep.Query(terms = Seq("the"), limit = 5)
    val p1 = Grep.query(spark, routedPath, base).collect().map(_.getAs[Long]("seq"))
    val p2 = Grep.query(spark, routedPath, base.copy(offset = 5)).collect().map(_.getAs[Long]("seq"))
    assert(p1.toSet.intersect(p2.toSet).isEmpty)
    val all = Grep.query(spark, routedPath, base.copy(limit = 10)).collect().map(_.getAs[Long]("seq"))
    assert(all.toSeq == (p1 ++ p2).toSeq)
  }

  test("NOT terms negate (Sphinx '-term' semantics)") {
    val df = spark.read.parquet(routedPath)
    val pos = df.filter(Grep.matchPredicate(Seq("retry"), Grep.MatchAny)).count()
    // every "retry" fixture sentence also contains "merge"; the numeric
    // suffix varies → negate on a digit token that only some rows carry.
    val q = Grep.Query(terms = Seq("retry"), notTerms = Seq("7", "42"), limit = 1000000)
    val got = Grep.query(spark, routedPath, q).collect()
    assert(got.nonEmpty && got.length < pos)
    assert(got.forall { r =>
      val toks = r.getAs[String]("text").toLowerCase.split("\\W+").toSet
      toks.contains("retry") && !toks.contains("7") && !toks.contains("42")
    })
  }

  test("multi-sink selector prunes to the chosen (tool, role) partitions") {
    val sinks = Seq(SinkKey("bash", "tool"), SinkKey("search", "tool"))
    val q = Grep.Query(limit = 1000000)
    val got = Grep.querySinks(spark, routedPath, sinks, q)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Seq("bash", "search").contains(r.getAs[String]("tool_key"))))
    val plan = got.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") || !plan.contains("edit"),
      "sink selection must reach the partition filters")
  }

  test("multi-table union grep (unionByName across routed tables)") {
    val out2 = tmpDir("grep2")
    Pipeline.run(spark, Gen.turns(spark, 2000L, seed = 7L).toDF(), out2,
      Pipeline.Config())
    val q = Grep.Query(terms = Seq("retry"), limit = 1000000)
    val a = Grep.query(spark, routedPath, q).count()
    val b = Grep.query(spark, s"$out2/routed", q).count()
    val u = Grep.queryTables(spark, Seq(routedPath, s"$out2/routed"), q).count()
    assert(u == a + b)
  }

  test("total honors max_matches bound") {
    val q = Grep.Query(terms = Seq("the"))
    val full = Grep.total(spark, routedPath, q)
    assert(Grep.total(spark, routedPath, q, maxMatches = Some(3)) == math.min(3L, full))
  }

  test("context view returns the ±N window in turn order") {
    val ctx = Grep.context(spark, routedPath, "conv_hot00000", 100, 2).collect()
    assert(ctx.map(_.getAs[Int]("turn_idx")).toSeq == Seq(98, 99, 100, 101, 102))
  }

  test("date-range queries prune day partitions") {
    val q = Grep.Query(
      tsFrom = Some(java.sql.Timestamp.valueOf("2025-01-01 00:00:00")),
      tsTo = Some(java.sql.Timestamp.valueOf("2025-01-01 23:59:59")), limit = 1000000)
    val got = Grep.query(spark, routedPath, q)
    assert(got.collect().forall(_.getAs[java.sql.Date]("day").toString == "2025-01-01"))
    // physical plan reads only the matching day partitions
    val scan = got.queryExecution.executedPlan.toString()
    assert(!scan.contains("2025-01-03") || scan.contains("PartitionFilters"))
  }
}
