package graft.alco

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end wiring of alco's collect → parse → store → aggregate loop
  * (SURVEY.md §3 E1) as one declarative Spark plan:
  *
  *   read → Parse.stage (grok, codegen) → quarantine split →
  *   Enrich.stage (broadcast joins) → Route.stage (keys/seq/salt) →
  *   REPLACE dedup → resume filter (anti-join vs committed partitions) →
  *   salted repartition → partitioned write (tool/role/day) →
  *   rollup + distinct aggregates → manifest commit + audit rows.
  *
  * Scale design: ONE shuffled fan-out write with `partitionBy` (not N
  * filtered jobs — alco ran one collector process per index; Spark routes
  * all sinks in a single pass). The repartition key includes `salt` so a hot
  * (tool, role, day) group spreads over many tasks; AQE coalesces small
  * post-shuffle partitions and splits skewed ones.
  */
object Pipeline {

  final case class Config(
      saltBuckets: Int = 64,
      maxRecordsPerFile: Long = 2L * 1000 * 1000,
      distinctColumns: Seq[String] = Seq("role", "called_tool", "status"))

  final case class Result(
      batchId: Long,
      snapshotId: Long,
      inputRows: Long,
      routedRows: Long,
      quarantinedRows: Long,
      skippedCommitted: Long,
      stageTimings: Map[String, Long])

  /** Columns of the routed (stored) rows — FIXTURES.md §4. */
  val routedColumns: Seq[String] = Seq(
    "conv_id", "turn_idx", "role", "tool", "day", "ts", "text",
    "called_tool", "dur_ms", "status", "bytes", "attrs", "seq")

  def run(spark: SparkSession, turns: DataFrame, outRoot: String,
          cfg: Config = Config(), batchId: Long = 0L): Result = {
    val t0 = System.nanoTime()
    def ms(since: Long): Long = (System.nanoTime() - since) / 1000000L

    val routedPath = s"$outRoot/routed"

    // parse → quarantine → enrich → route: one fused declarative plan
    // (single WholeStageCodegen span up to the dedup shuffle).
    val parsed = Parse.stage(turns)
    val (ok, quarantine) = Parse.splitQuarantine(parsed)
    val enriched = Enrich.stage(spark)(ok)
    val routed0 = Route.replaceSemantics(Route.stage(cfg.saltBuckets)(enriched))

    // Resume: skip partitions already committed in the sink manifest
    // (Iceberg-snapshot emulation, SURVEY.md §7.4). Broadcast anti-join —
    // the committed set is O(#partitions), tiny.
    // Directory partitioning cannot represent the empty-string tool (it
    // round-trips as null), so the partition key is a sanitized `tool_key`
    // while `tool` stays a data column — alco's LoggerIndex-name analog.
    val keyed = routed0.withColumn("tool_key",
      when(col("tool") === "", lit("_none")).otherwise(col("tool")))

    val committed = Manifest.committedPartitions(routedPath)
    val routed1 =
      if (committed.isEmpty) keyed
      else {
        import spark.implicits._
        val cdf = committed.toSeq.toDF("__part")
        keyed
          .withColumn("__part", format_string("tool_key=%s/role=%s/day=%s",
            col("tool_key"), col("role"), col("day").cast("string")))
          .join(broadcast(cdf), Seq("__part"), "left_anti")
          .drop("__part")
      }

    // Salted repartition: shuffle key = (tool, role, day, salt). The salt
    // never enters the sort key, so stable (conv_id, turn_idx) ordering
    // within files is preserved.
    val shuffleParts = math.max(spark.sparkContext.defaultParallelism, 8)
    val toWrite = routed1
      .select(routedColumns.map(col) ++ Seq(col("tool_key"), col("salt")): _*)
      .repartition(shuffleParts, col("tool_key"), col("role"), col("day"), col("salt"))
      .sortWithinPartitions("tool_key", "role", "day", "conv_id", "turn_idx")
      .drop("salt")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val tWrite = System.nanoTime()
    toWrite.write
      .mode(SaveMode.Append)
      .option("maxRecordsPerFile", cfg.maxRecordsPerFile)
      .partitionBy("tool_key", "role", "day")
      .parquet(routedPath)
    val writeMs = ms(tWrite)

    // Aggregates (alco's Redis rollups) — recomputed from the same cached
    // routed batch, written as tables next to the sink.
    val tAgg = System.nanoTime()
    Agg.rollupCounts(toWrite).write.mode(SaveMode.Overwrite)
      .parquet(s"$outRoot/rollup_counts_batch_$batchId")
    Agg.distinctSets(toWrite, cfg.distinctColumns).write.mode(SaveMode.Overwrite)
      .parquet(s"$outRoot/distinct_sets_batch_$batchId")
    val aggMs = ms(tAgg)

    // Lineage: per-partition row counts → manifest snapshot + audit table.
    val stats = toWrite
      .groupBy(col("tool_key"), col("role"), col("day")).count()
      .collect()
      .map(r => Manifest.PartitionStat(
        s"tool_key=${r.getString(0)}/role=${r.getString(1)}/day=${r.get(2)}",
        r.getLong(3)))
      .toSeq
    val routedRows = stats.map(_.rowCount).sum
    val quarantined = quarantine.count()
    val inputRows = turns.count()

    val snap = Manifest.commit(routedPath, batchId, stats, ms(t0))

    import spark.implicits._
    val audit = stats.map(s =>
      (snap.snapshotId, batchId, s.partition, s.rowCount, ms(t0)))
      .toDF("snapshot_id", "batch_id", "partition", "row_count", "wall_ms")
    audit.write.mode(SaveMode.Append).parquet(s"$outRoot/audit")

    toWrite.unpersist()
    Result(batchId, snap.snapshotId, inputRows, routedRows, quarantined,
      skippedCommitted = committed.size.toLong,
      stageTimings = Map("write_ms" -> writeMs, "agg_ms" -> aggMs,
        "total_ms" -> ms(t0)))
  }
}
