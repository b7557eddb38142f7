package graft

import java.nio.file.Files

import graft.alco.{Gen, Pipeline}
import org.apache.spark.sql.SparkSession

/** Benchmark main. Two measurements, one JSON line out:
  *
  *  1. Headline operator queries over SPARK_GRAFT_SF_DIR (per-query sec).
  *  2. The full alco parse→enrich→route→aggregate pipeline over a generated
  *     transcripts table, run at TWO parallelism levels (local[8] vs
  *     local[32]) on the same input — the sandbox proxy for the north
  *     rule's N vs 4N executor scaling criterion. Reports turns/sec at each
  *     level and efficiency = (tps32/tps8)/4 (target ≥ 0.8, BASELINE.md).
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

  private def session(cpus: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    .getOrCreate()

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val pipelineRows = sys.env.getOrElse("SPARK_GRAFT_PIPELINE_ROWS", "4000000").toLong

    // ── 1. headline queries at the requested parallelism ──
    var spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val qTimes = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val sec = timed { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        name -> sec
      }
    }

    // generated transcripts input, written once, reused at both levels
    val work = Files.createTempDirectory("graft_bench").toString
    val inPath = s"$work/transcripts"
    Gen.writeTable(spark, pipelineRows, inPath, numPartitions = 128)
    spark.stop()

    // ── 2. pipeline at two parallelism levels (N=8, 4N=32) ──
    def runPipeline(ncpu: Int, tag: String): Double = {
      val s = session(ncpu)
      s.sparkContext.setLogLevel("WARN")
      val turns = s.read.parquet(inPath)
      // warm-up JIT/codegen on a slice, then one timed full run
      Pipeline.run(s, turns.limit(50000), s"$work/warm_$tag", batchId = 0L)
      val sec = timed {
        Pipeline.run(s, turns, s"$work/out_$tag", batchId = 1L)
      }
      s.stop()
      sec
    }

    val sec8 = runPipeline(8, "n8")
    val sec32 = runPipeline(32, "n32")
    val tps8 = pipelineRows / sec8
    val tps32 = pipelineRows / sec32
    val eff = (tps32 / tps8) / 4.0

    val qs = qTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = qTimes.map(_._2).sum
    println(
      f"""{"metric":"pipeline_turns_per_sec","value":$tps32%.0f,"unit":"turns/sec","queries":$qs,"sf":"$sfDir","queries_total_sec":$total%.3f,"pipeline":{"rows":$pipelineRows,"sec_local8":$sec8%.2f,"sec_local32":$sec32%.2f,"tps_local8":$tps8%.0f,"tps_local32":$tps32%.0f,"scaling_efficiency":$eff%.3f}}""")
  }
}
