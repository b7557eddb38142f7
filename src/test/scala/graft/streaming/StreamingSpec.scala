package graft.streaming

import graft.SparkSpec
import graft.alco.{Agg, Enrich, Gen, Parse, Route}
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming rollup (AvailableNow) equals the batch rollup") {
    val in = tmpDir("stream_in")
    Gen.turns(spark, 5000L).toDF().write.mode("overwrite").parquet(in)
    val q = StreamPipeline.rollupQuery(spark, in, tmpDir("ckpt"), "stream_rollup")
    q.awaitTermination()
    val got = spark.table("stream_rollup")
      .select($"tool", $"role", $"window_start", $"n")
      .as[(String, String, java.sql.Timestamp, Long)].collect().toSet

    val (ok, _) = Parse.splitQuarantine(Parse.stage(spark.read.parquet(in)))
    val want = Agg.rollupCounts(ok)
      .select($"tool", $"role", $"window_start", $"n")
      .as[(String, String, java.sql.Timestamp, Long)].collect().toSet
    assert(got == want)
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
