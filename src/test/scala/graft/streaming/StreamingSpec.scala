package graft.streaming

import graft.SparkSpec
import graft.alco.{Agg, Enrich, Gen, Parse, Route}
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming rollup upsert sink equals the batch rollup, incrementally") {
    def batchRollup(in: String) = {
      val (ok, _) = Parse.splitQuarantine(Parse.stage(spark.read.parquet(in)))
      Agg.rollupCounts(ok)
        .select($"tool", $"role", $"window_start", $"n")
        .as[(String, String, java.sql.Timestamp, Long)].collect().toSet
    }
    def tableRollup(out: String) =
      StreamPipeline.readRollup(spark, out).get
        .select($"tool", $"role", $"window_start", $"n")
        .as[(String, String, java.sql.Timestamp, Long)].collect().toSet

    val in = tmpDir("stream_in")
    val out = tmpDir("stream_rollup_out")
    val ckpt = tmpDir("ckpt")
    // horizon must cover the generated ~5-day span: update mode really
    // drops rows later than the watermark (the production contract — the
    // complete-mode demo it replaces never evicted state), and the
    // generator's files arrive in random ts order.
    Gen.turns(spark, 5000L).toDF().write.mode("overwrite").parquet(in)
    StreamPipeline.rollupQuery(spark, in, out, ckpt, horizon = "30 days")
      .awaitTermination()
    assert(tableRollup(out) == batchRollup(in))

    // MORE data arrives (different seed ⇒ different rows, same windows get
    // new counts); the restarted query must ship only CHANGED windows and
    // the upserted table must still equal a full batch recompute.
    Gen.turns(spark, 2000L, seed = 7L).toDF().write.mode("append").parquet(in)
    StreamPipeline.rollupQuery(spark, in, out, ckpt, horizon = "30 days")
      .awaitTermination()
    assert(tableRollup(out) == batchRollup(in),
      "incremental upsert must converge to the batch rollup")
  }

  test("streaming route writes the same partitioned layout; checkpoint resumes") {
    val in = tmpDir("stream_in2")
    val out = tmpDir("stream_out")
    val ckpt = tmpDir("stream_ckpt")
    Gen.turns(spark, 3000L).toDF().write.mode("overwrite").parquet(in)

    val q1 = StreamPipeline.routeQuery(spark, in, out, ckpt)
    q1.awaitTermination()
    val n1 = spark.read.parquet(s"$out/routed").count()
    assert(n1 > 0)
    // restart with no new files: checkpoint ⇒ nothing reprocessed
    val q2 = StreamPipeline.routeQuery(spark, in, out, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(s"$out/routed").count() == n1, "no double-processing")
    // layout: day-partitioned dirs exist
    val dirs = new java.io.File(s"$out/routed").listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("tool_key=")))
  }
}
