package graft

import graft.alco.{Gen, Parse, Route}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the plans must not just be correct, they must
  * be the plans you'd want at 100 TB — filters reaching the parquet scan,
  * dims broadcast, top-k never global-sorting, projections pruned, and the
  * near-unique dedup hash actually dissolving conversation skew.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("q04 filter is pushed down to the parquet scan") {
    val p = plan(SparkEntry.queries("q04_filter_in")(spark, dir))
    assert(p.contains("PushedFilters") && p.contains("event_type"),
      s"expected pushed filters in:\n$p")
  }

  test("q02 scan is column-pruned to the referenced columns") {
    val p = plan(SparkEntry.queries("q02_json_parse")(spark, dir))
    assert(p.contains("ReadSchema") && !p.contains("user_id"),
      "projection must prune unused columns from the scan")
  }

  test("q07 enrich uses BroadcastHashJoin (no shuffle of the fact side)") {
    val p = plan(SparkEntry.queries("q07_enrich_bcast")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected BHJ in:\n$p")
  }

  test("q13 top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan(SparkEntry.queries("q13_topk")(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k exec in:\n$p")
  }

  test("q09 anti join stays a broadcast/hash join") {
    val p = plan(SparkEntry.queries("q09_anti_join")(spark, dir))
    assert(p.contains("LeftAnti"), s"expected anti join in:\n$p")
  }

  test("pipeline parse stage stays inside WholeStageCodegen") {
    // `executedPlan.toString` marks codegen'd operators with "*(n)"; every
    // Project of the parse stage (classify + extract incl. the attrs map)
    // must carry it — from_json would silently drop extract out of codegen.
    val parsed = Parse.stage(Gen.turns(spark, 1000L).toDF())
    val p = plan(parsed.filter(col("pattern_id") =!= 0))
    val projects = p.linesIterator.filter(_.contains("Project")).toSeq
    assert(projects.nonEmpty && projects.forall(_.contains("*(")),
      s"every parse Project must be codegen'd:\n$p")
  }

  test("fused flagship parse plan COMPILES — no silent interpreted fallback") {
    // Round 3's failure mode: planning succeeded, the plan string showed
    // `*(n)` codegen markers, but Janino compilation failed at RUNTIME
    // ("Code grows beyond 64 KB") and the flagship plans executed
    // interpreted. The shared test session sets spark.sql.codegen.fallback
    // =false, so executing the exact round-3 failing fusion — Project of
    // classify+extract+enrich+seq over two BroadcastHashJoins — now
    // throws if the generated method ever regresses past the JVM limit.
    val fused = Route.stage(
      graft.alco.Enrich.stage(spark)(
        Parse.splitQuarantine(Parse.stage(Gen.turns(spark, 2000L).toDF()))._1))
    assert(fused.count() > 0)
  }

  test("codegen blowup is loud under the suite's no-fallback conf") {
    // Round 3's exact failure, deliberately reintroduced: WITHOUT the
    // generator's text pushdown barrier, the quarantine filter is pushed
    // through the generator projections, substituting the giant text CASE
    // into the classify predicate many times — the fused stage's generated
    // method blows Janino's 64 KB limit. This MUST fail loudly: if it ever
    // passes, either the no-fallback guard has been lost (blowups go silent
    // again) or the optimizer stopped exploding this shape (and the barrier
    // could be retired). Both are worth knowing (round-3 verdict task 3).
    val raw = Gen.turns(spark, 2000L, textBarrier = false).toDF()
    val fused = Route.stage(
      graft.alco.Enrich.stage(spark)(
        Parse.splitQuarantine(Parse.stage(raw))._1))
    val e = intercept[Throwable](fused.count())
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("64 KB") || msgs.toLowerCase.contains("compil"),
      s"expected a codegen compile failure, got: $msgs")
  }

  test("ANN top-k plans have no Window — bounded TopKRows hash agg instead") {
    Seq("q24_ann_brute", "q25_ann_lsh").foreach { q =>
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(!p.contains("Window"), s"$q must not plan a window:\n$p")
      assert(p.contains("ObjectHashAggregate"), s"$q expected hash agg:\n$p")
    }
  }

  test("q14 offset pagination bounds with TakeOrdered before the window") {
    val p = plan(SparkEntry.queries("q14_pagination")(spark, dir))
    assert(p.contains("TakeOrderedAndProject"),
      s"q14 must bound with a distributed top-k first:\n$p")
  }

  test("q75 fused grep: one plan with partition pruning + bounded top-k") {
    // The E2 composition (filters + match + ts range + offset pagination)
    // must stay ONE fused scan plan: the day/role predicates prune
    // partition DIRECTORIES (never a full-table scan), and the page is
    // bounded by a distributed TakeOrdered of offset+limit rows before the
    // 150-row window — never a global sort of the matches.
    val p = plan(SparkEntry.queries("q75_grep_fused")(spark, dir))
    assert(p.contains("TakeOrderedAndProject"),
      s"q75 must bound the page with a distributed top-k:\n$p")
    val pruned = "PartitionFilters: \\[[^\\]]*day".r.findFirstIn(p)
    assert(pruned.nonEmpty,
      s"q75 must prune day partitions at the scan:\n$p")
    assert("PartitionFilters: \\[[^\\]]*role".r.findFirstIn(p).nonEmpty,
      s"q75 role IN filter must prune role partitions:\n$p")
  }

  test("q21 jaccard pairs plans no cartesian product") {
    val p = plan(SparkEntry.queries("q21_jaccard_pairs")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q21 must use the postings equi-join:\n$p")
  }

  test("q17 REPLACE dedup is a hash aggregate, not a window sort") {
    val p = plan(SparkEntry.queries("q17_dedup_replace")(spark, dir))
    assert(!p.contains("Window") && p.contains("ObjectHashAggregate"),
      s"q17 must aggregate, not window-sort:\n$p")
  }

  test("q44/q45/q47 match and sample predicates are shuffle-free single scans") {
    Seq("q44_match_quorum", "q45_match_proximity", "q47_hash_sample").foreach { q =>
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(!p.contains("Exchange"),
        s"$q must be a scan+filter with no shuffle:\n$p")
    }
    // q45's predicate is the codegen'd single-pass expression, not the
    // interpreted exists/slice HOF chain it replaced
    val p45 = plan(SparkEntry.queries("q45_match_proximity")(spark, dir))
    assert(p45.contains("proximity_match") && !p45.contains("exists("),
      s"q45 must filter via graft.functions.ProximityMatch:\n$p45")
  }

  test("q51/q52 curation projections are shuffle-free; q53 is one hash shuffle") {
    Seq("q51_pii_redact", "q52_repetition").foreach { q =>
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(!p.contains("Exchange"),
        s"$q must be a pure projection with no shuffle:\n$p")
    }
    val p53 = plan(SparkEntry.queries("q53_url_domains")(spark, dir))
    assert(p53.split("Exchange").length <= 2 && !p53.contains("Sort"),
      s"q53 must be extract→explode→ONE hash-agg shuffle, no sort:\n$p53")
  }

  test("q54 decontamination broadcasts the benchmark; q55 sampling is shuffle-free") {
    // the 100 TB corpus must never sort-merge against the benchmark —
    // gram matching is a map-side broadcast join
    val p54 = plan(SparkEntry.queries("q54_decontaminate")(spark, dir))
    assert(p54.contains("BroadcastHashJoin") && !p54.contains("SortMergeJoin"),
      s"q54 must broadcast the benchmark gram set:\n$p54")
    val p55 = plan(SparkEntry.queries("q55_stratified_sample")(spark, dir))
    assert(!p55.contains("Exchange"),
      s"q55 must be a pure filter with no shuffle:\n$p55")
    // chunking inflates rows by design but must never move them
    val p56 = plan(SparkEntry.queries("q56_chunking")(spark, dir))
    assert(!p56.contains("Exchange") && p56.contains("Generate"),
      s"q56 must be scan→project→generate with no shuffle:\n$p56")
    // mixture resampling inflates rows by design (epoch copies) but the
    // weight map is a literal CASE — no join, and the corpus never moves
    val p84 = plan(SparkEntry.queries("q84_mixture_resample")(spark, dir))
    assert(!p84.contains("Exchange") && !p84.contains("Join") &&
      p84.contains("Generate"),
      s"q84 must be scan→filter→generate with no shuffle and no join:\n$p84")
  }

  test("q58 line dedup explodes once, joins on equi-keys, never windows") {
    // boilerplate membership must stay an equi-join (AQE broadcasts the
    // small frequent-line set at runtime) and reassembly is an aggregate,
    // not a window sort over the exploded lines
    val p = plan(SparkEntry.queries("q58_line_dedup")(spark, dir))
    assert(p.contains("Generate") && !p.contains("Window") &&
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q58 must be explode→agg→equi-join→agg:\n$p")
  }

  test("q59 temperature resample broadcasts the rate table; corpus never sorts") {
    // the per-domain rates are one row per domain — broadcast back onto the
    // corpus; the corpus side must never sort-merge (only the tiny
    // (domain, count) partials may shuffle)
    val p = plan(SparkEntry.queries("q59_temperature_sample")(spark, dir))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("Window") && !p.contains("CartesianProduct"),
      s"q59 must be agg→broadcast rates→map-side filter:\n$p")
  }

  test("q60 semdedup pairs stay cluster-bounded — equi-join, never all-pairs") {
    // the pair stage must be an equi-join on the k-means cluster id; an
    // all-pairs cross join is the 100 TB killer this operator exists to
    // avoid (label propagation's own joins are equi-joins on id)
    val p = plan(SparkEntry.queries("q60_semdedup")(spark, dir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop") && !p.contains("Window"),
      s"q60 must never compare across clusters:\n$p")
  }

  test("q61 curate chain: one content shuffle, filters fused with the scan") {
    // quality + language are row filters Catalyst fuses into the scan
    // projection; the only by-content shuffle is the dedup's md5 groupBy
    // (plus the id semi-join back). No window, no cartesian, and the
    // sample stage adds no exchange of its own.
    val p = plan(SparkEntry.queries("q61_curate")(spark, dir))
    assert(!p.contains("Window") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop") && p.contains("HashAggregate"),
      s"q61 must be filter→hash-dedup→filter:\n$p")
  }

  test("q63 packing shuffles once by shard; q64/q65 are single aggregates") {
    // packing's only shuffle is the hash exchange to shards; the running
    // total is a per-shard window (bounded state), never a join
    val p63 = plan(SparkEntry.queries("q63_pack")(spark, dir))
    assert(p63.contains("Window") && !p63.contains("Join") &&
      p63.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"q63 must be one shard exchange + per-shard window:\n$p63")
    val p64 = plan(SparkEntry.queries("q64_profile")(spark, dir))
    assert(p64.contains("HashAggregate") && !p64.contains("Join") &&
      !p64.contains("Window"), s"q64 must be one hash aggregate:\n$p64")
    val p65 = plan(SparkEntry.queries("q65_histogram")(spark, dir))
    assert(p65.contains("HashAggregate") && !p65.contains("Join") &&
      !p65.contains("Window"), s"q65 must be one hash aggregate:\n$p65")
  }

  test("q66/q67 incremental dedup: hash anti-join / banded candidates, no cartesian") {
    val p66 = plan(SparkEntry.queries("q66_dedup_incremental")(spark, dir))
    assert(!p66.contains("CartesianProduct") &&
      !p66.contains("BroadcastNestedLoop") && !p66.contains("Window"),
      s"q66 must be an md5 anti-join:\n$p66")
    val p67 = plan(SparkEntry.queries("q67_neardup_incremental")(spark, dir))
    assert(!p67.contains("CartesianProduct") &&
      !p67.contains("BroadcastNestedLoop") && !p67.contains("Window"),
      s"q67 must stay LSH-bucketed:\n$p67")
  }

  test("multimodal resize is a single pass — no Exchange, no Join") {
    // Round 3 re-attached resized payloads via a self-join on media_id:
    // the whole table shuffled twice. One mapPartitions carrying all
    // columns does it shuffle-free (the dominant cost at binary-payload
    // scale is moving the bytes, and they must not move at all).
    val p = plan(graft.ops.Multimodal.resize(
      graft.ops.Multimodal.syntheticMedia(spark, 100), 128, 128))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"resize must not shuffle or join:\n$p")
  }

  test("q46 cluster closure plans no cartesian product") {
    val p = plan(SparkEntry.queries("q46_dedup_clusters")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q46 must stay equi-join based:\n$p")
  }

  test("dedup hash-shuffle dissolves the hot-conversation skew") {
    import spark.implicits._
    // 30% of rows share one conv_id; after the dedup aggregation the rows
    // must be spread near-uniformly (key = (conv_id, turn_idx)).
    val turns = Gen.turns(spark, 20000L).toDF()
    val deduped = Route.replaceSemantics(
      Route.stage(Parse.splitQuarantine(Parse.classify(turns))._1))
    val sizes = deduped
      .mapPartitions(it => Iterator.single(it.size)).collect().filter(_ > 0)
    val mx = sizes.max.toDouble
    val mean = sizes.sum.toDouble / sizes.length
    assert(mx / mean < 2.5,
      s"partition skew after dedup: max=$mx mean=$mean sizes=${sizes.toSeq}")
  }

  test("q68/q70 conversation ops are one hash aggregate; q69 one window; q71 TakeOrdered") {
    // assemble/stats: single hash shuffle on conv_id, group state bounded
    // by the (capped) conversation — never a join, never a window sort
    for (q <- Seq("q68_assemble", "q70_conv_stats")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(p.contains("Aggregate") && !p.contains("Window") &&
        !p.contains("Join"), s"$q must be one hash aggregate:\n$p")
    }
    // sessionize: both window functions share one (key, order) spec →
    // a single exchange + per-key sort, no join
    val p69 = plan(SparkEntry.queries("q69_sessionize")(spark, dir))
    assert(p69.contains("Window") && !p69.contains("Join") &&
      p69.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      s"q69 must be one exchange + one window:\n$p69")
    // heavy hitters: partial agg before the shuffle, top-k never
    // global-sorts
    val p71 = plan(SparkEntry.queries("q71_top_terms")(spark, dir))
    assert(p71.contains("TakeOrderedAndProject") && !p71.contains("Window") &&
      p71.contains("Generate"), s"q71 must takeOrdered after hash agg:\n$p71")
    // quantiles: one aggregate, no join/window; SFT pairs: both leads in
    // ONE window over one exchange, no join
    val p72 = plan(SparkEntry.queries("q72_token_quantiles")(spark, dir))
    assert(p72.contains("Aggregate") && !p72.contains("Join") &&
      !p72.contains("Window"), s"q72 must be one aggregate:\n$p72")
    val p73 = plan(SparkEntry.queries("q73_sft_pairs")(spark, dir))
    assert(p73.contains("Window") && !p73.contains("Join") &&
      p73.sliding("Window".length).count(_ == "Window") <= 2,
      s"q73 must be one window (both leads fused):\n$p73")
  }

  test("dedup is hash aggregation, not a sort-based window") {
    val turns = Gen.turns(spark, 1000L).toDF()
    val p = plan(Route.replaceSemantics(
      Route.stage(Parse.splitQuarantine(Parse.classify(turns))._1)))
    assert(p.contains("ObjectHashAggregate"),
      s"expected object-hash aggregate in:\n$p")
    assert(!p.contains("Window") && !p.contains("SortAggregate"),
      "REPLACE dedup must not plan a window or sort-aggregate")
  }
}
