package graft.alco

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end wiring of alco's collect → parse → store → aggregate loop
  * (SURVEY.md §3 E1):
  *
  *   read → Parse.stage (grok, codegen) → quarantine split →
  *   Enrich.stage (broadcast joins) → Route.stage (keys/seq/salt) →
  *   REPLACE dedup (ONE hash shuffle) → resume filter (anti-join vs
  *   committed partitions) → partitioned fan-out write (tool_key/role/day)
  *   → rollup + distinct aggregates from a pruned read-back →
  *   manifest commit + audit rows.
  *
  * Scale design (10^12 turns):
  *  - ONE data shuffle total. The REPLACE dedup's hash aggregation on
  *    (conv_id, turn_idx) both deduplicates AND spreads hot conversations
  *    uniformly (the near-unique key is its own salt), so no second
  *    routing repartition is needed: the dynamic-partition writer sorts
  *    each task's rows by (tool_key, role, day) and streams one file per
  *    sink dir.
  *  - NO persist of the wide rows. Aggregates/lineage are recomputed from
  *    a read-back of the batch's newly written partitions — partition-
  *    pruned (only this batch's dirs) and column-pruned (rollups touch 3
  *    columns), which at 100 TB is far cheaper than caching the full rows.
  *  - Input/quarantine counts ride the write pass via observe() — zero
  *    extra scans of the input.
  *  - ONE fan-out write with `partitionBy` (not N filtered jobs — alco ran
  *    one collector process per index; Spark routes all sinks in one pass).
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

    // Classify (cheap: pattern dispatch only) BEFORE the dedup shuffle —
    // alco parses before storing, so a malformed duplicate never replaces a
    // valid row. Field extraction + enrich joins run AFTER dedup: the
    // shuffle carries only flat narrow columns (no attrs map, no dim
    // attributes), and the per-row regex-group/enrich work happens once per
    // SURVIVING row — at 10^12 rows with redelivery dups this is the
    // difference between shuffling 100 TB of wide rows and 40 TB of flat.
    val obs = new org.apache.spark.sql.Observation(s"pipeline_batch_$batchId")
    val classified = Parse.classify(turns).observe(obs,
      count(lit(1)).as("input_rows"),
      count(when(col("pattern_id") === 0, 1)).as("quarantined_rows"))
    val (ok, quarantine) = Parse.splitQuarantine(classified)
    val deduped = Route.replaceSemantics(Route.stage(cfg.saltBuckets)(ok))
    val routed0 = Enrich.stage(spark)(Parse.extract(deduped)) // seq/salt survive dedup

    // Directory partitioning cannot represent the empty-string tool (it
    // round-trips as null), so the partition key is a sanitized `tool_key`
    // while `tool` stays a data column — alco's LoggerIndex-name analog.
    val keyed = routed0.withColumn("tool_key",
      when(col("tool") === "", lit("_none")).otherwise(col("tool")))

    // Resume: skip partitions already committed in the sink manifest
    // (Iceberg-snapshot emulation, SURVEY.md §7.4). Broadcast anti-join —
    // the committed set is O(#partitions), tiny.
    val committed = Manifest.committedPartitions(routedPath)
    val routed1 =
      if (committed.isEmpty) keyed
      else {
        import spark.implicits._
        val cdf = committed.toSeq.toDF("__part")
        keyed
          .withColumn("__part", partitionKey)
          .join(broadcast(cdf), Seq("__part"), "left_anti")
          .drop("__part")
      }

    // Fan-out write straight off the dedup shuffle. sortWithinPartitions by
    // the sink key keeps the dynamic-partition writer on one open file at a
    // time; (conv_id, turn_idx) as the sort tail preserves the stable order
    // inside each file. The salt column is dropped here (it exists for
    // callers that re-shuffle, e.g. streaming); the dedup hash partitioning
    // already spreads hot conversations uniformly.
    val tWrite = System.nanoTime()
    routed1
      .select(routedColumns.map(col) :+ col("tool_key"): _*)
      .sortWithinPartitions("tool_key", "role", "day", "conv_id", "turn_idx")
      .write
      .mode(SaveMode.Append)
      .option("maxRecordsPerFile", cfg.maxRecordsPerFile)
      .partitionBy("tool_key", "role", "day")
      .parquet(routedPath)
    val writeMs = ms(tWrite)

    // This batch's rows live in exactly the partition dirs that were NOT in
    // the pre-write committed set (resume guarantees a batch only ever
    // writes into uncommitted partitions), so the read-back lists the dirs
    // driver-side (O(#partitions)) and reads ONLY the new paths — no
    // full-table listing, no filter over old data.
    //
    // ONE aggregation job then feeds ALL batch metadata: per-(tool, role,
    // 1-day-window) counts (the rollup — exactly lineage granularity) plus
    // per-window collect_sets of the filtered columns. Its cardinality is
    // bounded (tools × roles × days — a few thousand rows/year even at
    // 10^12 turns), so the driver merges the distinct sets and
    // re-parallelizes three tiny tables for free. At 4 threads this is the
    // difference between ~7 s of stacked read-back jobs and ~2 s.
    val tAgg = System.nanoTime()
    val newParts = listPartitionDirs(spark, routedPath) -- committed
    import spark.implicits._
    val rollRows: Array[org.apache.spark.sql.Row] =
      if (newParts.isEmpty) Array.empty
      else {
        val batchDf = spark.read.option("basePath", routedPath)
          .parquet(newParts.toSeq.map(p => s"$routedPath/$p"): _*)
        val setCols = cfg.distinctColumns.map(c =>
          sort_array(collect_set(col(c).cast("string"))).as(s"set_$c"))
        batchDf
          .groupBy(col("tool"), col("role"), window(col("ts"), "1 day"))
          .agg(count(lit(1)).as("n"), setCols: _*)
          .select(Seq(col("tool"), col("role"),
            col("window.start").as("window_start"),
            col("window.end").as("window_end"), col("n")) ++
            cfg.distinctColumns.map(c => col(s"set_$c")): _*)
          .collect()
      }

    rollRows.toSeq.map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
      .toDF("tool", "role", "window_start", "window_end", "n")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outRoot/rollup_counts_batch_$batchId")

    // distinct-value sets per (sink, column) — alco's Redis SADD caches —
    // merged across windows driver-side (bounded value space, D6).
    val distinctRows = rollRows.toSeq.flatMap { r =>
      val sink = s"${r.getString(0)}/${r.getString(1)}"
      cfg.distinctColumns.zipWithIndex.map { case (c, i) =>
        ((sink, c), r.getSeq[String](5 + i).toSet)
      }
    }.groupMapReduce(_._1)(_._2)(_ ++ _)
      .toSeq.collect { case ((sink, c), vs) if vs.nonEmpty => (sink, c, vs.toSeq.sorted) }
    distinctRows.toDF("sink_key", "column", "values")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outRoot/distinct_sets_batch_$batchId")

    // Lineage: per-partition row counts → manifest snapshot + audit table.
    val stats = rollRows.map { r =>
      val toolKey = if (r.getString(0).isEmpty) "_none" else r.getString(0)
      val day = r.getTimestamp(2).toInstant.atZone(java.time.ZoneOffset.UTC)
        .toLocalDate.toString
      Manifest.PartitionStat(
        s"tool_key=$toolKey/role=${r.getString(1)}/day=$day", r.getLong(4))
    }.toSeq
    val aggMs = ms(tAgg)
    val routedRows = stats.map(_.rowCount).sum

    // observe() metrics ride the write pass for free; edge cases (fully
    // pruned rerun → no tasks touch the observe node) fall back to counting.
    val metrics = scala.util.Try(obs.get).toOption.filter(_.nonEmpty)
    val quarantined = metrics.map(_("quarantined_rows").asInstanceOf[Long])
      .getOrElse(quarantine.count())
    val inputRows = metrics.map(_("input_rows").asInstanceOf[Long])
      .getOrElse(turns.count())

    val snap = Manifest.commit(routedPath, batchId, stats, ms(t0))

    val audit = stats.map(s =>
      (snap.snapshotId, batchId, s.partition, s.rowCount, ms(t0)))
      .toDF("snapshot_id", "batch_id", "partition", "row_count", "wall_ms")
    audit.write.mode(SaveMode.Append).parquet(s"$outRoot/audit")

    Result(batchId, snap.snapshotId, inputRows, routedRows, quarantined,
      skippedCommitted = committed.size.toLong,
      stageTimings = Map("write_ms" -> writeMs, "agg_ms" -> aggMs,
        "total_ms" -> ms(t0)))
  }

  /** "tool_key=…/role=…/day=…" — the partition identity used by the
    * manifest's committed set.
    */
  private def partitionKey =
    format_string("tool_key=%s/role=%s/day=%s",
      col("tool_key"), col("role"), col("day").cast("string"))

  /** Driver-side listing of the table's partition dirs (O(#partitions)
    * filesystem metadata, never O(rows)) as manifest partition keys.
    */
  private def listPartitionDirs(spark: SparkSession, root: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Set.empty
    val glob = new org.apache.hadoop.fs.Path(root, "tool_key=*/role=*/day=*")
    Option(fs.globStatus(glob)).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map { st =>
        val d = st.getPath
        s"${d.getParent.getParent.getName}/${d.getParent.getName}/${d.getName}"
      }.toSet
  }
}
