package graft.streaming

import graft.alco.{Model, Parse}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming variant of the alco loop (SURVEY.md O31-O35).
  *
  * Reference analog: alco's collector daemons consuming RabbitMQ with
  * batch-size/timeout flushes [PK collector.py]. Sandbox has no Kafka jar,
  * so the source is the file source (`maxFilesPerTrigger` = the batch knob);
  * swapping in Kafka is a `format()` change.
  *
  * Divergence documented in SURVEY.md O32: alco accepts unbounded lateness
  * (a late message lands in its day's shard); the streaming aggregate needs
  * a watermark to bound state, so batch recomputation remains the equality
  * path for rollups while the stream gives low-latency approximations.
  */
object StreamPipeline {

  def source(spark: SparkSession, inDir: String, maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(Model.turnSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)

  /** Routed fan-out write: each micro-batch runs the FULL batch pipeline
    * (classify → REPLACE dedup → extract/enrich → partitioned write →
    * manifest commit), keyed by the streaming batchId. This is the
    * recommended Structured-Streaming exactly-once recipe: foreachBatch
    * replays a batchId on failure, and Pipeline.run's manifest makes that
    * replay a no-op (committed batchId short-circuits) while a crash
    * mid-batch leaves only orphan files the rerun deletes — so the sink is
    * exactly-once end-to-end, with the same per-partition lineage/audit
    * trail as the batch path (O31/O35).
    */
  def routeQuery(spark: SparkSession, inDir: String, outDir: String,
                 checkpoint: String, saltBuckets: Int = 16): StreamingQuery = {
    val cfg = graft.alco.Pipeline.Config(saltBuckets = saltBuckets)
    source(spark, inDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // writerId = the checkpoint location: stable across restarts of the
        // SAME query lineage (replayed batchIds stay idempotent), distinct
        // for a fresh checkpoint whose batchIds restart at 0.
        graft.alco.Pipeline.run(spark, batch, outDir, cfg, batchId,
          writerId = checkpoint)
        (): Unit
      }
      .start()
  }

  /** Windowed streaming rollup (1-day tumbling, watermarked) — alco's
    * incremental Redis counters as a stateful streaming aggregate.
    */
  def rollupQuery(spark: SparkSession, inDir: String, checkpoint: String,
                  queryName: String): StreamingQuery = {
    val (ok, _) = Parse.splitQuarantine(Parse.stage(source(spark, inDir)))
    ok.withWatermark("ts", "1 day")
      .groupBy(col("tool"), col("role"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(col("tool"), col("role"),
        col("window.start").as("window_start"), col("n"))
      .writeStream
      // complete mode: append would hold back still-open windows until the
      // watermark passes them — with bounded AvailableNow input the last
      // day's counts would never emit. State stays bounded by (sinks × days
      // inside the watermark horizon).
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming dedup (REPLACE semantics, O34): drop duplicate
    * (conv_id, turn_idx) within the watermark horizon.
    */
  def dedupStream(df: DataFrame): DataFrame =
    df.withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")
}
