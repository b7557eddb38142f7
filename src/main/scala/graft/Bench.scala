package graft

import java.nio.file.Files

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
  * Generation is excluded from timing (input is written to disk first).
  */
object Bench {

  // Heavy pairwise queries excluded; these are the operator headline set.
  private val headline = Seq(
    "q01_rollup_counts", "q02_json_parse", "q04_filter_in", "q05_match_any",
    "q07_enrich_bcast", "q08_join_large", "q09_anti_join", "q11_distinct_sets",
    "q13_topk", "q17_dedup_replace", "q19_dedup_exact", "q22_minhash_lsh",
    "q24_ann_brute", "q26_langid", "q28_token_counts", "q29_fingerprint")

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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 8M timed rows × 4 pairs: big enough that fixed per-job overhead is
    // ~2-3% of the fast leg, small enough to afford 4 interleaved pairs —
    // more min-samples beats a longer single sample on this noisy host
    // (round-2 lesson; task-metric profile shows constant total CPU and
    // 0.99 busy at 1 thread, so per-level mins estimate true capability).
    val pipelineRows = sys.env.getOrElse("SPARK_GRAFT_PIPELINE_ROWS", "8000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "4").toInt

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

    // generated transcripts input, written once, reused at both levels
    val work = Files.createTempDirectory(
      java.nio.file.Paths.get(workBase), "graft_bench").toString
    val inPath = s"$work/transcripts"
    Gen.writeTable(spark, pipelineRows, inPath, numPartitions = 128)
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
    // partitions).
    val nLow = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1").toInt
    val nHigh = 4 * nLow
    def once(ncpu: Int, tag: String, warm: Boolean): Double = {
      val s = session(ncpu)
      s.sparkContext.setLogLevel("WARN")
      val turns = s.read.parquet(inPath)
      if (warm) Pipeline.run(s, turns.limit(100000), s"$work/warm_$tag", batchId = 0L)
      val sec = timed { Pipeline.run(s, turns, s"$work/out_$tag", batchId = 1L) }
      s.stop()
      sec
    }
    // Efficiency is computed per adjacent (low, high) PAIR — both legs of
    // a pair run back-to-back in the same noise window, so their ratio is
    // meaningful even when absolute times aren't; we report the best pair.
    // Throughput is still the per-level min (true capability).
    val pairs = (1 to reps).map { i =>
      (once(nLow, s"n${nLow}_$i", warm = i == 1),
        once(nHigh, s"n${nHigh}_$i", warm = i == 1))
    }
    val sec8 = pairs.map(_._1).min
    val sec32 = pairs.map(_._2).min
    val tps8 = pipelineRows / sec8
    val tps32 = pipelineRows / sec32
    // Efficiency estimator: MEDIAN of the per-pair ratios, clamped at 1.0
    // (the round-1 advisor's primary suggestion — the max systematically
    // picks the luckiest pair and can exceed 1.0). Both legs of a pair run
    // back-to-back, so host-speed waves partially cancel inside a pair;
    // the median then rejects pairs a wave straddled. The per-level-min
    // ratio (the advisor's alternative) is reported alongside — BOTH are
    // biased in opposite directions when waves are shorter than a leg, so
    // publishing the pair list keeps the measurement honest.
    // Contemporaneous host ceiling: a purely CPU-bound, shuffle-free,
    // IO-free hash reduction at the same two levels, in the same noise
    // window. The ceiling itself drifts with host load (measured 0.83–0.95
    // for 1→4 threads across windows on this microVM), so the pipeline's
    // efficiency is reported raw AND normalized by what the host could do
    // for ANY perfectly parallel job at that moment.
    def cpuLeg(ncpu: Int): Double = {
      val s = session(ncpu)
      s.sparkContext.setLogLevel("WARN")
      val sec = timed {
        s.range(0, 1200000000L, 1, ncpu * 4)
          .select(max(xxhash64(col("id"), col("id") + 3, col("id") + 7)))
          .collect()
      }
      s.stop()
      sec
    }
    val ceiling = {
      val c1 = cpuLeg(nLow); val c4 = cpuLeg(nHigh)
      math.min((c1 / c4) / 4.0, 1.0)
    }

    val pairEffs = pairs.map { case (lo, hi) => math.min((lo / hi) / 4.0, 1.0) }
      .sorted
    val medianPairEff =
      if (pairEffs.length % 2 == 1) pairEffs(pairEffs.length / 2)
      else (pairEffs(pairEffs.length / 2 - 1) + pairEffs(pairEffs.length / 2)) / 2.0
    val minRatioEff = math.min((sec8 / sec32) / 4.0, 1.0)
    val eff = medianPairEff

    val qs = qTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = qTimes.map(_._2).sum
    val pairsJson = pairEffs.map(e => f"$e%.3f").mkString("[", ",", "]")
    val json =
      f"""{"metric":"pipeline_turns_per_sec","value":$tps32%.0f,"unit":"turns/sec","queries":$qs,"sf":"$sfDir","queries_total_sec":$total%.3f,"pipeline":{"rows":$pipelineRows,"n_executors":$nLow,"n4_executors":$nHigh,"sec_localN":$sec8%.2f,"sec_local4N":$sec32%.2f,"tps_localN":$tps8%.0f,"tps_local4N":$tps32%.0f,"pair_efficiencies":$pairsJson,"min_ratio_efficiency":$minRatioEff%.3f,"cpu_ceiling_efficiency":$ceiling%.3f,"ceiling_normalized_efficiency":${math.min(eff / ceiling, 1.0)}%.3f,"scaling_efficiency":$eff%.3f}}"""
    println(json)
    // stdout gets buried in sbt [info]/log noise — persist the line so the
    // bench signal can't silently vanish (round-1 BENCH had parsed:null).
    Files.write(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
