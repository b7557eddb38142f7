package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.alco.{Gen, Pipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max, xxhash64}

/** Benchmark main. Two measurements, one JSON line out:
  *
  *  1. Headline operator queries over SPARK_GRAFT_SF_DIR (per-query sec).
  *  2. The full alco parse→enrich→route→aggregate pipeline over a generated
  *     transcripts table, run at TWO parallelism levels (local[N] vs
  *     local[4N], default 1 vs 4) on the same input — the sandbox proxy for
  *     the north rule's N vs 4N executor scaling criterion. Reports
  *     turns/sec at each level and efficiency = (tps_4N/tps_N)/4 (target
  *     ≥ 0.8, BASELINE.md). See the in-method comment for why N=1 and why
  *     interleaved-min sampling.
  *
  * Round-4 instrumentation (verdict r3 asked for an ATTRIBUTABLE bench —
  * the driver window showed a ~56 s parallelism-independent term the
  * pure-CPU ceiling could not see):
  *  - every pipeline leg publishes its per-stage wall clocks
  *    (setup/write/agg/commit/outputs from Pipeline.Result.stageTimings),
  *    so a degraded leg is attributable to a specific stage;
  *  - each pair carries a MEMORY-BANDWIDTH ceiling leg (raw threads
  *    stream-summing large arrays) next to the pure-CPU one: a window where
  *    cpu scales but mem does not is host memory pressure, which is exactly
  *    the component a tiny-working-set CPU loop cannot observe;
  *  - the work dir is swept at startup (stale graft_bench* from killed
  *    runs), each leg's output is deleted as soon as it is measured, and
  *    the whole tree is deleted on exit — earlier rounds leaked the full
  *    working set into tmpfs on every driver kill, and tmpfs pages ARE
  *    host memory;
  *  - the JSON records workBase and whether SPARK_LOCAL_DIRS was inherited
  *    from the environment (it OVERRIDES spark.local.dir in local mode —
  *    if it points at the shared virtio disk, every shuffle serializes on
  *    one device queue; build.sbt pins it to tmpfs for forked runs).
  *
  * Estimator semantics (ADVICE r3, medium): `scaling_efficiency` is the
  * MEASURED median pair ratio again (clamped at 1.0) — the ceiling-
  * normalized value moved to `normalized_scaling_efficiency`, and
  * `measurable_pairs` reports the true count (0 when no pair passed the
  * ceiling filter, even though the normalized median then falls back to
  * all pairs).
  *
  * Round-5 instrumentation (verdict r4 #1 — the bench must SURVIVE a
  * stolen host window inside the driver's budget, not merely attribute
  * it):
  *  - (a) every pipeline leg publishes aggregate task metrics
  *    (run_sec/cpu_sec/gc_sec/busy in `leg_stage_ms`): constant cpu_sec
  *    per row at the BASELINE.md baseline with run_sec ≫ cpu_sec is
  *    steal, proven inside the artifact itself;
  *  - (b) leg-size calibration: a small pipeline run in today's window
  *    projects the N-thread leg's wall; rows shrink (4M → 1M floor)
  *    until legs fit inside one noise wave (~SPARK_GRAFT_MAX_LEG_SEC,
  *    default 180 s) — past that, within-pair cancellation is
  *    known-broken (16M-row postmortem);
  *  - (c) a pair whose pure-CPU ceiling lands < 0.75 halves the row count
  *    for subsequent pairs and the loop keeps going (up to
  *    SPARK_GRAFT_BENCH_MAX_PAIRS, default 8) until `reps` MEASURABLE
  *    pairs exist — degraded windows buy more, smaller pairs instead of
  *    fewer huge ones.
  *
  * Generation is excluded from timing (input is written to disk first).
  */
object Bench {

  // Heavy pairwise queries excluded; these are the operator headline set
  // (q58/q61/q63 added in round 4 so the curation-suite shapes — explode→
  // agg→join line dedup, the composed filter→dedup→sample chain, and the
  // shard-window packing — report next to the original operator families).
  private val headline = Seq(
    "q01_rollup_counts", "q02_json_parse", "q04_filter_in", "q05_match_any",
    "q07_enrich_bcast", "q08_join_large", "q09_anti_join", "q11_distinct_sets",
    "q13_topk", "q17_dedup_replace", "q19_dedup_exact", "q22_minhash_lsh",
    "q24_ann_brute", "q26_langid", "q28_token_counts", "q29_fingerprint",
    "q43_match_phrase", "q44_match_quorum", "q47_hash_sample",
    "q58_line_dedup", "q61_curate", "q63_pack",
    // round-4 conversation-level ops: one-shuffle assemble, the
    // single-window sessionizer, and the explode→agg→topk heavy hitters
    "q68_assemble", "q69_sessionize", "q71_top_terms")

  /** Bench working set lives on tmpfs when available: a real N/4N-executor
    * cluster has per-executor local disks, so the sandbox's ONE shared
    * virtio disk would add a serialization point the deployment target
    * doesn't have (same class of artifact as the vCPU-oversubscription
    * ceiling documented in BASELINE.md). Override: SPARK_GRAFT_WORK_DIR.
    */
  private val workBase: String = sys.env.get("SPARK_GRAFT_WORK_DIR")
    .orElse(Option("/dev/shm").filter(d => java.nio.file.Files.isWritable(
      java.nio.file.Paths.get(d))))
    .getOrElse(System.getProperty("java.io.tmpdir"))

  private def session(cpus: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.local.dir", s"$workBase/graft_spark_local") // shuffle/spill on tmpfs too
    // ≥16 shuffle partitions even at low thread counts: bounds per-reduce
    // hash-agg state (GC-friendly) and AQE coalesces the excess anyway.
    .config("spark.sql.shuffle.partitions", math.max(cpus * 4, 16).toString)
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (32 * 1024 * 1024).toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    // 32 concurrent dynamic-partition writers buffer a row group each —
    // 32 MB keeps total writer memory ~1 GB instead of 4 GB at 128 MB.
    .config("spark.hadoop.parquet.block.size", (32 * 1024 * 1024).toString)
    .getOrCreate()

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  // commons-io (on the Spark classpath) — closes its streams, never throws
  private def deleteTree(p: Path): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)

  /** True iff nothing under `p` was modified in the last `quietSec` —
    * i.e. the tree is debris, not a live working dir.
    */
  private def treeQuietFor(p: Path, quietSec: Long): Boolean = {
    val cutoff = System.currentTimeMillis() - quietSec * 1000L
    val s = Files.walk(p)
    try !s.anyMatch(f => f.toFile.lastModified() > cutoff)
    finally s.close()
  }

  /** Sweep working-set debris this or any PREVIOUS run left on tmpfs:
    * graft_bench* input/output trees and the shared spark.local.dir. tmpfs
    * pages are host RAM — a few killed driver runs used to accumulate the
    * whole 4M-row working set times N, and that memory pressure is
    * invisible to the pure-CPU ceiling leg.
    *
    * Both sweep classes are guarded by the 10-minute quiet window:
    * graft_spark_local is SHARED with every other forked graft JVM
    * (build.sbt pins SPARK_LOCAL_DIRS), and a graft_bench* tree may be a
    * CONCURRENT bench invocation's live working set (ADVICE r4, low) — a
    * tree with recent mtimes is in use and must never be deleted out from
    * under its owner; only genuinely stale debris (killed runs) is swept.
    */
  private def sweepStale(): Unit = {
    val base = Paths.get(workBase)
    if (!Files.isDirectory(base)) return
    val it = Files.list(base).iterator()
    while (it.hasNext) {
      val p = it.next()
      val n = p.getFileName.toString
      val sweep = (n.startsWith("graft_bench") || n == "graft_spark_local") &&
        (try treeQuietFor(p, 600L) catch { case _: Exception => false })
      if (sweep) try deleteTree(p) catch { case _: Exception => }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 4M rows is the TARGET leg size (clean-window slow leg ~80-100 s —
    // inside one host noise wave); the calibration step below shrinks it
    // when today's window projects past SPARK_GRAFT_MAX_LEG_SEC. Round 2's
    // 8M × 4 pairs blew the driver wall-clock budget (rc=124, all signal
    // lost).
    val pipelineRows = sys.env.getOrElse("SPARK_GRAFT_PIPELINE_ROWS", "4000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "4").toInt
    // Hard deadline on STARTING new pairs: the driver kills the whole run
    // at ~45 min with exit 124 and nothing parsed, so finishing early with
    // fewer pairs strictly dominates. A pair starts only if its projected
    // END (budget = worst observed pair × 1.15) fits the deadline, so the
    // run ends by ~deadline + estimation slack ≈ 33 min worst case.
    val deadlineSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE", "1800").toLong
    val wallStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - wallStart) / 1e9

    sweepStale()

    // ── 1. headline queries at the requested parallelism ──
    var spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def runHeadline(): Seq[(String, Double)] = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val sec = timed { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        name -> sec
      }
    }
    runHeadline() // warm-up pass: JIT + codegen cache, excluded from timing
    val qTimes = runHeadline()

    // ── incremental flush: the JSON line is (re)written after the headline
    // phase and after EVERY pair, so a driver kill mid-run still leaves the
    // latest complete measurement on disk (round-2 lesson: the end-only
    // write lost everything to rc=124).
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    def flush(json: String): Unit = {
      println(json)
      Files.write(outPath,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    val qs = qTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val qTotal = qTimes.map(_._2).sum
    // Environment diagnostics: where the working set and shuffle dirs
    // actually live. SPARK_LOCAL_DIRS (env) OVERRIDES spark.local.dir in
    // local mode — when the parent process exports it pointing at the
    // shared virtio disk, every leg's shuffle serializes on one device
    // queue and the scaling measurement is of the DISK, not the pipeline.
    val envLocal = sys.env.get("SPARK_LOCAL_DIRS")
    val diag = s""""work_base":"$workBase","spark_local_dirs_env":${
      envLocal.map("\"" + _ + "\"").getOrElse("null")}"""
    flush(f"""{"metric":"pipeline_turns_per_sec","value":0,"unit":"turns/sec","queries":$qs,"sf":"$sfDir","queries_total_sec":$qTotal%.3f,$diag,"phase":"headline_only"}""")

    val work = Files.createTempDirectory(
      java.nio.file.Paths.get(workBase), "graft_bench").toString
    spark.stop()

    // ── 2. pipeline at two parallelism levels (N and 4N threads) ──
    // Sandbox proxy for the north rule's two cluster sizes. The host is a
    // shared microVM with minute-scale noisy-neighbor waves (a fixed config
    // varies 30s↔250s), so: (a) the levels are INTERLEAVED A/B/A/B and we
    // take the per-level MIN — the min reflects true capability, medians
    // absorb whole noise waves; (b) N=1 vs 4N=4 by default — the pure-CPU
    // microbench (graft.CpuScale) shows this host's efficiency CEILING for
    // perfectly parallel code is 0.95 at 1→4 threads, ~0.8 at 2→8 and 0.69
    // at 8→32 (vCPUs outnumber physical cores), so 1→4 is the only window
    // where the ≥0.8 criterion is even measurable. Each run writes a fresh
    // outRoot (the manifest would otherwise legitimately skip committed
    // partitions), deleted as soon as the leg is measured.
    val nLow = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1").toInt
    val nHigh = 4 * nLow
    // Per-leg task metrics (VERDICT r4 #1a): every pipeline leg publishes
    // aggregate executor run/CPU/GC seconds next to its wall clock. This is
    // the steal proof the artifact was missing: a degraded leg with
    // cpu_sec at the known per-row baseline but run_sec ≫ cpu_sec means
    // the threads HELD tasks but rarely got a physical core — host vCPU
    // steal, not pipeline work; and a leg whose cpu_sec itself inflated
    // names real extra compute. (Same listener as Profile's pipeline3
    // mode.) Metrics are read after session.stop(), which drains the
    // listener bus.
    final case class Leg(sec: Double, stages: Map[String, Long],
                         runSec: Double, cpuSec: Double, gcSec: Double,
                         threads: Int) {
      def busy: Double = if (sec <= 0) 0.0 else runSec / (sec * threads)
    }
    def once(ncpu: Int, tag: String, warm: Boolean, inPath: String): Leg = {
      val s = session(ncpu)
      s.sparkContext.setLogLevel("WARN")
      val acc = new java.util.concurrent.atomic.AtomicLongArray(3)
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) {
              acc.addAndGet(0, m.executorRunTime)
              acc.addAndGet(1, m.executorCpuTime / 1000000L)
              acc.addAndGet(2, m.jvmGCTime)
            }
          }
        })
      val turns = s.read.parquet(inPath)
      if (warm) {
        Pipeline.run(s, turns.limit(100000), s"$work/warm_$tag", batchId = 0L)
        deleteTree(Paths.get(s"$work/warm_$tag"))
      }
      (0 until 3).foreach(acc.set(_, 0L)) // timed leg only, not the warm-up
      var stages = Map.empty[String, Long]
      val sec = timed {
        stages = Pipeline.run(s, turns, s"$work/out_$tag", batchId = 1L)
          .stageTimings
      }
      s.stop() // drains the listener bus before the metrics are read
      deleteTree(Paths.get(s"$work/out_$tag"))
      Leg(sec, stages, acc.get(0) / 1e3, acc.get(1) / 1e3, acc.get(2) / 1e3,
        ncpu)
    }
    // One measurement "pair" = pipeline at N and 4N threads back-to-back,
    // IMMEDIATELY followed by ceiling legs at the same two levels — all in
    // one noise window:
    //  - cpu ceiling: shuffle-free, IO-free codegen'd hash reduction — the
    //    host's best possible scaling for ANY perfectly parallel
    //    cache-resident job at that moment (observed 0.83-0.95 for 1→4
    //    threads; the 4N leg degrades disproportionately under contention
    //    because 4 vCPUs must be co-scheduled while 1 slips into gaps);
    //  - mem ceiling: raw threads stream-summing 256 MB arrays — the same
    //    instrument for MEMORY BANDWIDTH, which a shuffle-heavy pipeline
    //    consumes and the cache-resident cpu loop cannot see.
    // The pipeline ratio NORMALIZED by its contemporaneous cpu ceiling
    // isolates the pipeline's own scaling from host weather; the mem
    // ceiling attributes the windows where that normalization is not
    // enough. All raw lists are published (measured, normalized, ceilings,
    // per-leg stage timings) so every estimator can be audited.
    final case class PairMeas(rows: Long, pipeLo: Leg, pipeHi: Leg,
                              ceilLo: Double, ceilHi: Double,
                              memLo: Double, memHi: Double) {
      def rawRatio: Double = (pipeLo.sec / pipeHi.sec) / 4.0 // unclamped
      def ceilRatio: Double = (ceilLo / ceilHi) / 4.0 // unclamped
      def memRatio: Double = (memLo / memHi) / 4.0 // unclamped
      def rawEff: Double = math.min(rawRatio, 1.0)
      def ceilEff: Double = math.min(ceilRatio, 1.0)
      def memEff: Double = math.min(memRatio, 1.0)
      def normEff: Double = math.min(rawEff / ceilEff, 1.0)
      def measurable: Boolean = ceilEff >= 0.70
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def stagesJson(l: Leg): String =
      (Seq("setup_ms", "write_ms", "agg_ms", "commit_ms", "outputs_ms", "total_ms")
        .flatMap(k => l.stages.get(k).map(v => s""""$k":$v""")) ++
        Seq(f""""run_sec":${l.runSec}%.1f""", f""""cpu_sec":${l.cpuSec}%.1f""",
          f""""gc_sec":${l.gcSec}%.1f""", f""""busy":${l.busy}%.3f"""))
        .mkString("{", ",", "}")
    var calInfo = "" // set after the calibration leg; empty only before it
    def partialJson(pairs: Vector[PairMeas]): String = {
      // pairs may run at different row counts (the degraded-window shrink
      // path), so throughput and the per-level-min estimator are computed
      // in tps space, never by mixing walls across pairs
      val bestLo = pairs.map(p => p.rows / p.pipeLo.sec).max
      val bestHi = pairs.map(p => p.rows / p.pipeHi.sec).max
      val secLo = pairs.filter(p => p.rows / p.pipeLo.sec == bestLo)
        .map(_.pipeLo.sec).min
      val secHi = pairs.filter(p => p.rows / p.pipeHi.sec == bestHi)
        .map(_.pipeHi.sec).min
      val rawEff = median(pairs.map(_.rawEff))
      val usable = pairs.filter(_.measurable)
      val normEff = median((if (usable.isEmpty) pairs else usable).map(_.normEff))
      val minRatioEff = math.min((bestHi / bestLo) / 4.0, 1.0)
      def list(xs: Seq[Double]) = xs.map(e => f"$e%.3f").mkString("[", ",", "]")
      val legs = pairs.map(p =>
        s"""{"rows":${p.rows},"n":${stagesJson(p.pipeLo)},"n4":${stagesJson(p.pipeHi)}}""")
        .mkString("[", ",", "]")
      f"""{"metric":"pipeline_turns_per_sec","value":$bestHi%.0f,"unit":"turns/sec","queries":$qs,"sf":"$sfDir","queries_total_sec":$qTotal%.3f,$diag,"pipeline":{$calInfo"rows":${pairs.last.rows},"n_executors":$nLow,"n4_executors":$nHigh,"sec_localN":$secLo%.2f,"sec_local4N":$secHi%.2f,"tps_localN":$bestLo%.0f,"tps_local4N":$bestHi%.0f,"pair_efficiencies":${list(pairs.map(_.rawRatio))},"pair_ceiling_efficiencies":${list(pairs.map(_.ceilRatio))},"pair_mem_efficiencies":${list(pairs.map(_.memRatio))},"pair_normalized_efficiencies":${list(pairs.map(_.normEff))},"leg_stage_ms":$legs,"measurable_pairs":${usable.length},"min_ratio_efficiency":$minRatioEff%.3f,"raw_scaling_efficiency":$rawEff%.3f,"cpu_ceiling_efficiency":${median(pairs.map(_.ceilEff))}%.3f,"mem_ceiling_efficiency":${median(pairs.map(_.memEff))}%.3f,"normalized_scaling_efficiency":$normEff%.3f,"scaling_efficiency":$rawEff%.3f}}"""
    }

    def cpuLeg(ncpu: Int): Double = {
      val s = session(ncpu)
      s.sparkContext.setLogLevel("WARN")
      val sec = timed {
        s.range(0, 300000000L, 1, ncpu * 4)
          .select(max(xxhash64(col("id"), col("id") + 3, col("id") + 7)))
          .collect()
      }
      s.stop()
      sec
    }

    // Memory-bandwidth ceiling: FIXED total work — 32 × 32 MB long arrays
    // (1 GB), each stream-summed 4 times — split across `threads` raw JVM
    // threads, so the (lo/hi)/4 ratio formula matches the other legs.
    // 32 chunks, not `threads` chunks: the split must stay fair for any
    // thread count up to 32 (with 4 × 256 MB arrays, thread counts above
    // 4 ran at 4-way parallelism and the ceiling under-reported whenever
    // SPARK_GRAFT_SCALE_N > 1). No Spark, no allocation inside the timed
    // region — pure load-bandwidth. DRAM bandwidth shared with neighbors
    // is the component a cache-resident CPU loop cannot see: a window
    // where cpu scales but mem craters is host memory starvation, not
    // pipeline code.
    val memArrays = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    def memLeg(threads: Int): Double = {
      val nArrays = 32
      val size = 4 * 1024 * 1024 // longs → 32 MB per chunk, 1 GB total
      (0 until nArrays).foreach(t =>
        memArrays.computeIfAbsent(t, t0 => Array.tabulate(size)(i => (i + t0).toLong)))
      val sink = new java.util.concurrent.atomic.AtomicLong()
      timed {
        val ts = (0 until threads).map { t =>
          val th = new Thread(() => {
            var acc = 0L
            var ai = t
            while (ai < nArrays) {
              val a = memArrays.get(ai)
              var pass = 0
              while (pass < 4) {
                var i = 0
                while (i < a.length) { acc += a(i); i += 1 }
                pass += 1
              }
              ai += threads
            }
            sink.addAndGet(acc)
          }, s"memleg-$t")
          th.start(); th
        }
        ts.foreach(_.join())
      }
    }

    // ── leg-size calibration (VERDICT r4 #1b). BASELINE.md's 16M-row
    // postmortem: within-pair noise cancellation only works while both
    // legs fit inside ONE of the host's minute-scale waves — a degraded
    // window can stretch a 4M-row 1-thread leg past 20 minutes, and no
    // estimator recovers a defensible number from that. So the slow leg's
    // wall is PROJECTED from a small calibration run in *today's* window,
    // and the row count shrinks until the projection fits ~maxLegSec
    // (floor 1M rows, below which fixed per-job overhead dominates).
    def genInput(n: Long): String = {
      val p = s"$work/transcripts_$n"
      if (!Files.isDirectory(Paths.get(p))) {
        val s = session(cpus)
        s.sparkContext.setLogLevel("WARN")
        Gen.writeTable(s, n, p, numPartitions = 128)
        s.stop()
      }
      p
    }
    val calRows = 200000L
    val minRows = 1000000L
    val maxLegSec = sys.env.getOrElse("SPARK_GRAFT_MAX_LEG_SEC", "180").toDouble
    val cal = once(nLow, "cal", warm = true, genInput(calRows))
    // Fixed per-run term INSIDE the timed region (job scheduling + commit +
    // batch outputs — session churn is outside `once`'s timer): ~1.5 s.
    // Must sit BELOW the fastest observed 200k-row calibration wall
    // (~4.4 s in a clean window), or perRow clamps to the epsilon and the
    // projection can never trigger a shrink.
    val fixedSec = 1.5
    val perRow = math.max(1e-7, (cal.sec - fixedSec) / calRows)
    var rows = pipelineRows
    val projectedSec = fixedSec + perRow * rows
    if (projectedSec > maxLegSec)
      rows = math.max(minRows,
        (((maxLegSec - fixedSec) / perRow).toLong / 500000L) * 500000L)
    calInfo = f""""calibration":{"cal_rows":$calRows,"cal_sec":${cal.sec}%.2f,"cal_cpu_sec":${cal.cpuSec}%.1f,"projected_n_leg_sec":$projectedSec%.1f,"max_leg_sec":$maxLegSec%.0f,"rows_target":$pipelineRows,"rows_chosen":$rows},"""
    deleteTree(Paths.get(s"$work/transcripts_$calRows"))

    // The loop respects the deadline — never START a pair we can't afford
    // (budget = the last observed pair × 1.15) — and flushes the JSON
    // after every pair, so a driver kill can lose at most the in-flight
    // pair, never the run. The work tree is deleted on ANY exit.
    //
    // Degraded windows buy MORE, SMALLER pairs (VERDICT r4 #1c): a pair
    // whose contemporaneous pure-CPU ceiling lands below 0.75 evidences
    // nothing about the pipeline, so the loop halves the row count
    // (floor 1M) and keeps going — up to maxPairs total — until `reps`
    // MEASURABLE pairs exist or the deadline closes in. Small pairs fit
    // inside single waves, and the median over more of them is the only
    // estimator that survives a stolen window.
    try {
      var pairBudget = math.max(60.0, 2.5 * (fixedSec + perRow * rows) * 1.3)
      var pairs = Vector.empty[PairMeas]
      val maxPairs = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_PAIRS", "8").toInt
      var inPath = genInput(rows)
      while (pairs.count(_.measurable) < reps && pairs.length < maxPairs &&
             (pairs.isEmpty || elapsedSec + pairBudget < deadlineSec)) {
        val i = pairs.length + 1
        val t0 = System.nanoTime()
        val pLo = once(nLow, s"n${nLow}_$i", warm = i == 1, inPath)
        val pHi = once(nHigh, s"n${nHigh}_$i", warm = i == 1, inPath)
        val cLo = cpuLeg(nLow)
        val cHi = cpuLeg(nHigh)
        val mLo = memLeg(nLow)
        val mHi = memLeg(nHigh)
        // release the 1 GB working set NOW: the next pair's pipeline legs
        // (the measured quantity) must not run with it live on the heap
        // (extra GC roots + less usable heap = a pair-1 vs pair-2+ bias);
        // memLeg re-tabulates outside its timed region
        memArrays.clear()
        val pm = PairMeas(rows, pLo, pHi, cLo, cHi, mLo, mHi)
        pairs = pairs :+ pm
        pairBudget = math.max(60.0, (System.nanoTime() - t0) / 1e9 * 1.15)
        flush(partialJson(pairs))
        if (pm.ceilEff < 0.75 && rows > minRows) {
          val shrunk = math.max(minRows, rows / 2)
          val old = inPath
          rows = shrunk
          inPath = genInput(rows)
          if (old != inPath) deleteTree(Paths.get(old))
          pairBudget = pairBudget / 2 + 30.0 // next pair is ~half the work
        }
      }
    } finally {
      memArrays.clear()
      deleteTree(Paths.get(work))
    }
  }
}
