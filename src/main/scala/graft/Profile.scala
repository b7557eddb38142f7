package graft

import graft.alco._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage profiler for the pipeline (perf tuning tool, not part of
  * the driver contract). Times each cumulative prefix of the pipeline with a
  * noop sink to isolate the bottleneck stage.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.Profile /path/transcripts"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_PIPELINE_ROWS", "4000000").toLong
    val workBase = sys.env.get("SPARK_GRAFT_WORK_DIR")
      .orElse(Option("/dev/shm").filter(d => java.nio.file.Files.isWritable(
        java.nio.file.Paths.get(d))))
      .getOrElse(System.getProperty("java.io.tmpdir"))
    // Stale graft_profile* working sets are leaked tmpfs pages (host RAM) —
    // sweep them before creating this run's dir (same policy as Bench).
    val baseDir = new java.io.File(workBase)
    Option(baseDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft_profile"))
      .foreach(f => org.apache.commons.io.FileUtils.deleteQuietly(f))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", s"$workBase/graft_spark_local")
      // shuffle/spill block codec experiment knob (SparkConf-level, so it
      // must be set before the context starts): lz4 (default) | snappy | zstd
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.sql.shuffle.partitions", math.max(cpus * 4, 16).toString) // 4× cores, floor 16 (match Bench)
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (32 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.parquet.block.size", (32 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(workBase), "graft_profile").toString
    val inPath = if (args.nonEmpty) args(0) else {
      val p = s"$work/transcripts"
      Gen.writeTable(spark, rows, p, numPartitions = 128)
      p
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val turns = spark.read.parquet(inPath)

    // PROFILE_MODE=pipeline3: just 1 warm + 3 timed full runs (scaling work),
    // with aggregate task metrics per rep (where does the 4N leg's time go —
    // CPU, GC, shuffle IO, or scheduling gaps?).
    if (sys.env.get("PROFILE_MODE").contains("pipeline3")) {
      val acc = new java.util.concurrent.atomic.AtomicLongArray(6)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) {
              acc.addAndGet(0, m.executorRunTime)
              acc.addAndGet(1, m.executorCpuTime / 1000000L)
              acc.addAndGet(2, m.jvmGCTime)
              acc.addAndGet(3, m.shuffleWriteMetrics.writeTime / 1000000L)
              acc.addAndGet(4, m.shuffleReadMetrics.fetchWaitTime)
              acc.addAndGet(5, 1L)
            }
          }
        })
      // A/B knob: comma-separated codec list cycled across reps (e.g.
      // "zstd,snappy,zstd,snappy" at REPS=4 gives interleaved pairs whose
      // within-pair ratio survives host noise waves)
      val codecs = sys.env.getOrElse("SPARK_GRAFT_CODECS", "zstd").split(",")
      val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
      Pipeline.run(spark, turns.limit(100000), s"$work/warm", batchId = 0L)
      (1 to reps).foreach { i =>
        (0 until 6).foreach(acc.set(_, 0L))
        val codec = codecs((i - 1) % codecs.length)
        val t0 = System.nanoTime()
        val r = Pipeline.run(spark, turns, s"$work/out_$i", batchId = 1L,
          cfg = Pipeline.Config(parquetCodec = codec))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE pipeline_rep${i}_$codec ${sec}%8.2f s  stages=${r.stageTimings}  " +
          f"tasks=${acc.get(5)} runSec=${acc.get(0) / 1e3}%.1f cpuSec=${acc.get(1) / 1e3}%.1f " +
          f"gcSec=${acc.get(2) / 1e3}%.1f shufWriteSec=${acc.get(3) / 1e3}%.1f " +
          f"fetchWaitSec=${acc.get(4) / 1e3}%.1f busy=${acc.get(0) / 1e3 / (sec * cpus)}%.2f")
      }
      cleanup(work); spark.stop(); return
    }

    // PROFILE_MODE=enrichab: does the pipeline's enrich join (whose output
    // columns the write path provably drops) cost measurable time? A/B
    // interleaved pairs of the classify→dedup→extract chain with and
    // without Enrich.stage, noop sink — within-pair ratios survive host
    // noise waves (bench protocol).
    if (sys.env.get("PROFILE_MODE").contains("enrichab")) {
      val okOf = (d: DataFrame) => Parse.splitQuarantine(Parse.classify(d))._1
      def chain(enrich: Boolean): DataFrame = {
        val deduped = Route.replaceSemantics(Route.stage(okOf(turns)
          .drop(Parse.matchCols: _*)))
        val x = Parse.extract(deduped)
        val r = if (enrich) Enrich.stage(spark)(x) else x
        r.select(Pipeline.routedColumns.map(
          org.apache.spark.sql.functions.col): _*)
      }
      noop(chain(enrich = true)) // warm both shapes
      noop(chain(enrich = false))
      (1 to 4).foreach { i =>
        val tA = { val t0 = System.nanoTime(); noop(chain(enrich = true)); (System.nanoTime() - t0) / 1e9 }
        val tB = { val t0 = System.nanoTime(); noop(chain(enrich = false)); (System.nanoTime() - t0) / 1e9 }
        println(f"PROFILE enrichab_pair$i with=$tA%.2f without=$tB%.2f ratio=${tB / tA}%.3f")
      }
      cleanup(work); spark.stop(); return
    }

    // PROFILE_MODE=grokab: is the quarantine filter's pushed-down predicate
    // double-evaluating the grok matches (filter + projection)? A/B the
    // shipped classify→filter shape against one whose pattern_id is pinned
    // behind a PushdownBarrier (grok evaluated once, filter reads the
    // attribute), interleaved pairs, noop sink.
    if (sys.env.get("PROFILE_MODE").contains("grokab")) {
      import graft.functions.PushdownBarrier.barrier
      def chainA(): DataFrame =
        Parse.splitQuarantine(Parse.classify(turns))._1
          .drop(Parse.matchCols: _*)
      def chainB(): DataFrame = {
        val t = col("text")
        val looksStructured = t.startsWith("CALL") || t.startsWith("RESULT")
        val metaOk = col("role").isNotNull && col("role") =!= "" &&
          col("ts").isNotNull
        turns
          .withColumn("__g1", graft.functions.GrokMatch.grok_match(
            t, Parse.P1.regex, Parse.P1.fields))
          .withColumn("__g2", graft.functions.GrokMatch.grok_match(
            t, Parse.P2.regex, Parse.P2.fields))
          .withColumn("pattern_id", barrier(
            when(!metaOk, lit(0))
              .when(col("__g1").isNotNull, lit(1))
              .when(col("__g2").isNotNull, lit(2))
              .when(!looksStructured && length(t) > 0 && !t.contains("\n"), lit(3))
              .otherwise(lit(0))))
          .filter(col("pattern_id") =!= 0)
          .drop(Parse.matchCols: _*)
      }
      noop(chainA()); noop(chainB()) // warm both
      (1 to 4).foreach { i =>
        val tA = { val t0 = System.nanoTime(); noop(chainA()); (System.nanoTime() - t0) / 1e9 }
        val tB = { val t0 = System.nanoTime(); noop(chainB()); (System.nanoTime() - t0) / 1e9 }
        println(f"PROFILE grokab_pair$i shipped=$tA%.2f barrier=$tB%.2f ratio=${tB / tA}%.3f")
      }
      cleanup(work); spark.stop(); return
    }

    // PROFILE_MODE=grepindex: term-bloom index payoff at scale — ingest a
    // routed table, time a rare-term grep unindexed vs indexed (3 reps
    // each, interleave-free: the deltas of interest are 5-10× so window
    // noise can't fake them), plus the index build cost and file counts.
    if (sys.env.get("PROFILE_MODE").contains("grepindex")) {
      val root = s"$work/alco"
      timed("ingest")(Pipeline.run(spark, turns, root, batchId = 0L): Unit)
      val rp = s"$root/routed"
      val terms = sys.env.getOrElse("SPARK_GRAFT_GREP_TERMS", "421,137")
        .split(",").toSeq
      val q = Grep.Query(terms = terms, mode = Grep.MatchAny, limit = 1000000)
      def scan(): (Long, Int) = {
        val df = Grep.query(spark, rp, q)
        (df.count(), df.inputFiles.length)
      }
      var res = (0L, 0)
      (1 to 3).foreach(i => timed(s"grep_noindex_$i") { res = scan() })
      println(s"PROFILE noindex rows=${res._1} files=${res._2}")
      timed("index_build")(
        TermIndex.build(spark, root, numBits = 1 << 20): Unit)
      (1 to 3).foreach(i => timed(s"grep_indexed_$i") { res = scan() })
      println(s"PROFILE indexed rows=${res._1} files=${res._2}")
      cleanup(work); spark.stop(); return
    }

    val skipPrefix = sys.env.get("SKIP_PREFIX").nonEmpty
    if (!skipPrefix) timed("read_only")(noop(turns))
    val classify = (d: DataFrame) => Parse.classify(d)
    val okOf = (d: DataFrame) => Parse.splitQuarantine(Parse.classify(d))._1
    if (!skipPrefix) timed("s1_classify")(noop(classify(turns)))
    if (!skipPrefix) timed("s2_plus_dedup")(noop(
      Route.replaceSemantics(Route.stage(okOf(turns)))))
    val routedOf = (d: DataFrame) =>
      Enrich.stage(spark)(Parse.extract(
        Route.replaceSemantics(Route.stage(okOf(d)))))
        .withColumn("tool_key",
          when(col("tool") === "", lit("_none")).otherwise(col("tool")))
    if (!skipPrefix) timed("s3_plus_extract_enrich")(noop(routedOf(turns)))
    if (!skipPrefix) timed("s4_plus_write") {
      routedOf(turns)
        .select(Pipeline.routedColumns.map(col) :+ col("tool_key"): _*)
        .sortWithinPartitions("tool_key", "role", "day", "conv_id", "turn_idx")
        .write.mode("overwrite").option("maxRecordsPerFile", 2000000)
        .option("compression", "zstd") // mirror Pipeline.Config defaults
        .option("parquet.bloom.filter.enabled#conv_id", "true")
        .option("parquet.bloom.filter.expected.ndv#conv_id", "100000")
        .partitionBy("tool_key", "role", "day").parquet(s"$work/routed")
    }
    if (!skipPrefix) timed("s5_readback_aggs") {
      val back = spark.read.parquet(s"$work/routed")
      graft.alco.Agg.rollupCounts(back).collect()
      noop(graft.alco.Agg.distinctSets(back))
    }
    if (!skipPrefix) timed("full_pipeline_run") {
      Pipeline.run(spark, turns, s"$work/full", batchId = 9L)
    }

    // isolation experiments for the write path (EXPERIMENTS=1)
    if (sys.env.get("EXPERIMENTS").isEmpty) { cleanup(work); spark.stop(); return }
    // Same projection the pipeline writes (routedOf includes Parse.extract's
    // `day`; the earlier experiments build skipped extract and crashed on
    // partitionBy("day")). Cache it so each write variant times ONLY the
    // write, not a pipeline re-run.
    val deduped = routedOf(turns)
      .select(Pipeline.routedColumns.map(col) :+ col("tool_key"): _*)
      .cache()
    println(s"PROFILE dedup_out_rows ${deduped.count()}")
    if (Seq("BLOOM_ONLY", "TUNE_ONLY", "ZSTD_AB").forall(sys.env.get(_).isEmpty)) {
      timed("write_plain_nopartition") {
        deduped.write.mode("overwrite").parquet(s"$work/plain")
      }
      timed("write_partitioned_nosort") {
        deduped.write.mode("overwrite")
          .partitionBy("tool_key", "role", "day").parquet(s"$work/nosort")
      }
    }
    def sortedWrite(name: String)(opts: (String, String)*): Unit = timed(name) {
      val w = deduped
        .sortWithinPartitions("tool_key", "role", "day", "conv_id", "turn_idx")
        .write.mode("overwrite").option("maxRecordsPerFile", 2000000)
      opts.foreach { case (k, v) => w.option(k, v) }
      w.partitionBy("tool_key", "role", "day").parquet(s"$work/sorted")
      println(f"PROFILE   bytes_${name.stripPrefix("write_sorted_")}%-20s " +
        f"${dirBytes(s"$work/sorted") / 1e6}%10.1f MB")
    }
    // Untimed warm-up write first (JIT/codegen for the writer path), then
    // the variants — order REVERSED vs the first measurement session so an
    // order-dependent drift shows up as disagreement between the two runs.
    deduped.limit(500000)
      .sortWithinPartitions("tool_key", "role", "day", "conv_id", "turn_idx")
      .write.mode("overwrite").partitionBy("tool_key", "role", "day")
      .parquet(s"$work/warmwrite")
    val zstdPair: Seq[(String, Seq[(String, String)])] = Seq(
      "write_sorted_zstd3" -> Seq("compression" -> "zstd",
        "parquet.bloom.filter.enabled#conv_id" -> "true",
        "parquet.bloom.filter.expected.ndv#conv_id" -> "100000"),
      "write_sorted_zstd1" -> Seq("compression" -> "zstd",
        "parquet.compression.codec.zstd.level" -> "1",
        "parquet.bloom.filter.enabled#conv_id" -> "true",
        "parquet.bloom.filter.expected.ndv#conv_id" -> "100000"))
    val variants: Seq[(String, Seq[(String, String)])] =
      // interleaved A/B pairs (bench protocol): a host noise wave degrades
      // BOTH legs of a pair, so the within-pair ratio survives it
      if (sys.env.get("ZSTD_AB").nonEmpty)
        (1 to 3).flatMap(i => zstdPair.map { case (n, o) => (s"${n}_p$i", o) })
      else if (sys.env.get("TUNE_ONLY").nonEmpty) zstdPair ++ Seq(
        // all carry the pipeline's bloom options so deltas are vs shipped
        // shape (zstdPair = the shipped zstd3 + the zstd1 comparison)
        // dictionary off for the high-cardinality text column: the writer
        // otherwise builds a dict per page and throws it away at the
        // fallback threshold
        "write_sorted_zstd3_nodict" -> Seq("compression" -> "zstd",
          "parquet.enable.dictionary#text" -> "false",
          "parquet.enable.dictionary#attrs" -> "false",
          "parquet.bloom.filter.enabled#conv_id" -> "true",
          "parquet.bloom.filter.expected.ndv#conv_id" -> "100000"),
        "write_sorted_zstd1_nodict" -> Seq("compression" -> "zstd",
          "parquet.compression.codec.zstd.level" -> "1",
          "parquet.enable.dictionary#text" -> "false",
          "parquet.enable.dictionary#attrs" -> "false",
          "parquet.bloom.filter.enabled#conv_id" -> "true",
          "parquet.bloom.filter.expected.ndv#conv_id" -> "100000"),
        "write_sorted_zstd3_rep2" -> Seq("compression" -> "zstd",
          "parquet.bloom.filter.enabled#conv_id" -> "true",
          "parquet.bloom.filter.expected.ndv#conv_id" -> "100000"))
      else if (sys.env.get("BLOOM_ONLY").nonEmpty) Seq(
        "write_sorted_zstd" -> Seq("compression" -> "zstd"),
        "write_sorted_zstd_bloom" -> Seq("compression" -> "zstd",
          "parquet.bloom.filter.enabled#conv_id" -> "true"),
        // explicit NDV hint: parquet-java's ADAPTIVE bloom writer maintains
        // multiple candidate bitsets per row group until it learns the NDV —
        // the hint collapses that to one right-sized bitset up front.
        "write_sorted_zstd_bloom_ndv" -> Seq("compression" -> "zstd",
          "parquet.bloom.filter.enabled#conv_id" -> "true",
          "parquet.bloom.filter.expected.ndv#conv_id" -> "100000"),
        "write_sorted_zstd_rep2" -> Seq("compression" -> "zstd"))
      else Seq(
        "write_sorted_none" -> Seq("compression" -> "uncompressed"),
        "write_sorted_zstd" -> Seq("compression" -> "zstd"),
        "write_sorted_lz4" -> Seq("compression" -> "lz4_raw"),
        "write_sorted_snappy" -> Seq.empty,
        "write_sorted_snappy_bloom" -> Seq(
          "parquet.bloom.filter.enabled#conv_id" -> "true"),
        "write_sorted_zstd_bloom" -> Seq("compression" -> "zstd",
          "parquet.bloom.filter.enabled#conv_id" -> "true"),
        "write_sorted_none_rep2" -> Seq("compression" -> "uncompressed"))
    variants.foreach { case (n, o) => sortedWrite(n)(o: _*) }
    cleanup(work)
    spark.stop()
  }

  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else f.length()
    walk(new java.io.File(path))
  }

  /** Delete this run's working set unless it doubles as generated input the
    * caller may want to inspect (KEEP_WORK=1). tmpfs pages are host RAM. */
  private def cleanup(work: String): Unit =
    if (sys.env.get("KEEP_WORK").isEmpty)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
}
