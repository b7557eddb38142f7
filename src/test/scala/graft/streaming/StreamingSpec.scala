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

  test("rollup upsert: same-batchId replay is idempotent; null keys replace, not duplicate") {
    val out = tmpDir("rollup_replay")
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    def df(rows: (String, String, java.sql.Timestamp, Long)*) =
      rows.toSeq.toDF("tool", "role", "window_start", "n")
    def table() = StreamPipeline.readRollup(spark, out).get
      .as[(String, String, java.sql.Timestamp, Long)].collect().toSet

    StreamPipeline.upsertRollup(
      df(("bash", "tool", t(0), 5L), (null, "assistant", t(0), 2L)), out, 0L)
    val updates1 = df(("bash", "tool", t(0), 9L), (null, "assistant", t(0), 4L),
      ("edit", "tool", t(86400), 1L))
    StreamPipeline.upsertRollup(updates1, out, 1L)
    val expected = Set(("bash", "tool", t(0), 9L),
      (null.asInstanceOf[String], "assistant", t(0), 4L),
      ("edit", "tool", t(86400), 1L))
    assert(table() == expected,
      "changed keys (incl. the NULL-tool key) must be replaced, not duplicated")

    // foreachBatch REPLAY of batch 1 (crash between sink write and
    // checkpoint commit): must not throw read-overwrite, must converge to
    // the same table
    StreamPipeline.upsertRollup(updates1, out, 1L)
    assert(table() == expected, "replay must be a no-op rewrite of v-1")
  }

  test("rollup upsert vacuums versions beyond the replay-safe window") {
    // ADVICE r4: a long-running stream otherwise accumulates one full
    // rollup-table copy per trigger. Versions strictly older than the 2
    // below the current batch are unreachable (readers take the highest;
    // a replay of batch B merges from the highest version < B) and must
    // be deleted; the merge base and the latest version must survive.
    val out = tmpDir("rollup_vacuum")
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    (0L to 5L).foreach { b =>
      StreamPipeline.upsertRollup(
        Seq(("bash", "tool", t(b * 86400), b + 1))
          .toDF("tool", "role", "window_start", "n"), out, b)
    }
    val versions = new java.io.File(out).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("v-"))
      .map(_.getName.stripPrefix("v-").toLong).sorted.toSeq
    assert(versions == Seq(3L, 4L, 5L),
      s"expected only the replay window {3,4,5}, found v-$versions")
    // the surviving latest version still reads back the full merged table
    val n = StreamPipeline.readRollup(spark, out).get.count()
    assert(n == 6L, s"merged table must survive the vacuum, got $n rows")
  }

  private def sessSource(dir: String, maxFiles: Int) = {
    import org.apache.spark.sql.Encoders
    spark.readStream
      .schema(Encoders.product[SessionizeStream.Ev].schema)
      .option("maxFilesPerTrigger", maxFiles)
      .parquet(dir)
      .as[SessionizeStream.Ev]
  }

  private def runSess(name: String, dir: String, maxFiles: Int,
      gapSec: Long, horizon: String): Map[Long, Long] = {
    SessionizeStream.assign(sessSource(dir, maxFiles), gapSec, horizon)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    spark.table(name).select($"event_id", $"session_idx")
      .as[(Long, Long)].collect().toMap
  }

  test("streaming sessionize equals the batch sessionizer (in-batch disorder sorted)") {
    val dir = tmpDir("sess_in")
    // offset past epoch 0: the initial watermark is 0 ms, and stateful ops
    // drop rows at-or-before the watermark — a t=0 event would vanish
    def t(sec: Long) = new java.sql.Timestamp((1000000L + sec) * 1000L)
    // deliberately written out of order — the state function sorts each
    // batch by (ts, event_id)
    Seq((3L, 1L, t(200)), (1L, 1L, t(0)), (5L, 2L, t(300)),
      (2L, 1L, t(50)), (4L, 2L, t(0)))
      .toDF("event_id", "key", "ts").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val got = runSess("sess_eq", dir, maxFiles = 100, gapSec = 100L,
      horizon = "1 hour")
    val batch = graft.ops.Conversations.sessionize(
      spark.read.parquet(dir), "key", "ts", Seq("ts", "event_id"), 100L)
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(got == batch, s"stream=$got batch=$batch")
    assert(got(1L) == 0L && got(2L) == 0L && got(3L) == 1L &&
      got(4L) == 0L && got(5L) == 1L)
  }

  test("streaming sessionize GC: event-time timeout drops idle state (bounded)") {
    val dir = tmpDir("sess_gc_in")
    def t(sec: Long) = new java.sql.Timestamp((1000000L + sec) * 1000L)
    def put(rows: (Long, Long, java.sql.Timestamp)*): Unit = {
      rows.toSeq.toDF("event_id", "key", "ts").coalesce(1)
        .write.mode("append").parquet(dir)
      Thread.sleep(1100) // file source orders triggers by mtime (s resolution)
    }
    put((1L, 9L, t(0)))        // key 9 opens session 0
    put((2L, 8L, t(10000)))    // watermark jumps far past key 9's timeout
    put((3L, 8L, t(10001)))    // trigger with no key-9 data → timeout fires
    put((4L, 9L, t(10100)))    // key 9 reappears AFTER its state was GC'd
    val got = runSess("sess_gc", dir, maxFiles = 1, gapSec = 100L,
      horizon = "10 seconds")
    // restart at 0 proves the state really was removed — the documented
    // divergence vs batch (which would assign session 1); within the
    // horizon the previous test proves equality
    assert(got(1L) == 0L && got(4L) == 0L, s"got=$got")
    assert(got(2L) == 0L && got(3L) == 0L)
  }
}
