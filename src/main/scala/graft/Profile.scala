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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", s"$workBase/graft_spark_local")
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
      Pipeline.run(spark, turns.limit(100000), s"$work/warm", batchId = 0L)
      (1 to 3).foreach { i =>
        (0 until 6).foreach(acc.set(_, 0L))
        val t0 = System.nanoTime()
        val r = Pipeline.run(spark, turns, s"$work/out_$i", batchId = 1L)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE pipeline_rep$i ${sec}%8.2f s  stages=${r.stageTimings}  " +
          f"tasks=${acc.get(5)} runSec=${acc.get(0) / 1e3}%.1f cpuSec=${acc.get(1) / 1e3}%.1f " +
          f"gcSec=${acc.get(2) / 1e3}%.1f shufWriteSec=${acc.get(3) / 1e3}%.1f " +
          f"fetchWaitSec=${acc.get(4) / 1e3}%.1f busy=${acc.get(0) / 1e3 / (sec * cpus)}%.2f")
      }
      spark.stop(); return
    }

    timed("read_only")(noop(turns))
    val classify = (d: DataFrame) => Parse.classify(d)
    val okOf = (d: DataFrame) => Parse.splitQuarantine(Parse.classify(d))._1
    timed("s1_classify")(noop(classify(turns)))
    timed("s2_plus_dedup")(noop(
      Route.replaceSemantics(Route.stage(64)(okOf(turns)))))
    val routedOf = (d: DataFrame) =>
      Enrich.stage(spark)(Parse.extract(
        Route.replaceSemantics(Route.stage(64)(okOf(d)))))
        .withColumn("tool_key",
          when(col("tool") === "", lit("_none")).otherwise(col("tool")))
    timed("s3_plus_extract_enrich")(noop(routedOf(turns)))
    timed("s4_plus_write") {
      routedOf(turns)
        .select(Pipeline.routedColumns.map(col) :+ col("tool_key"): _*)
        .sortWithinPartitions("tool_key", "role", "day", "conv_id", "turn_idx")
        .write.mode("overwrite").option("maxRecordsPerFile", 2000000)
        .partitionBy("tool_key", "role", "day").parquet(s"$work/routed")
    }
    timed("s5_readback_aggs") {
      val back = spark.read.parquet(s"$work/routed")
      graft.alco.Agg.rollupCounts(back).collect()
      noop(graft.alco.Agg.distinctSets(back))
    }
    timed("full_pipeline_run") {
      Pipeline.run(spark, turns, s"$work/full", batchId = 9L)
    }

    // isolation experiments for the write path (EXPERIMENTS=1)
    if (sys.env.get("EXPERIMENTS").isEmpty) { spark.stop(); return }
    val deduped = Route.replaceSemantics(Route.stage(64)(Enrich.stage(spark)(okOf(turns))))
      .withColumn("tool_key",
        when(col("tool") === "", lit("_none")).otherwise(col("tool")))
    println(s"PROFILE dedup_out_partitions ${deduped.rdd.getNumPartitions}")
    timed("write_plain_nopartition") {
      deduped.drop("salt").write.mode("overwrite").parquet(s"$work/plain")
    }
    timed("write_partitioned_nosort") {
      deduped.drop("salt").write.mode("overwrite")
        .partitionBy("tool_key", "role", "day").parquet(s"$work/nosort")
    }
    timed("write_partitioned_sorted") {
      deduped.drop("salt")
        .sortWithinPartitions("tool_key", "role", "day", "conv_id", "turn_idx")
        .write.mode("overwrite")
        .partitionBy("tool_key", "role", "day").parquet(s"$work/sorted")
    }
    spark.stop()
  }
}
