package graft

import graft.ops._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for individual operator queries (tuning tool).
  * Round-6 experiment: q61's Filter node references `text_profile(text)`
  * ~15 times (FilterExec gets no subexpression elimination, unlike
  * ProjectExec) — does evaluating the profile once behind a projection
  * barrier beat the repeated inline evaluation at 100k docs?
  */
object QDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"QDEBUG $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    // inflate ×20 for signal (sf0.1 = 5k docs → 100k rows)
    val docs = (0 until 20).map(i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_.unionByName(_)).localCheckpoint()
    timed("scan_only")(docs.count())

    // the q61 head: quality >= 0.6 AND lang == en, as Curate builds it
    // (text_profile substituted into the Filter by project collapse)
    def inlineFilter(d: DataFrame): DataFrame = {
      val scored = TextAnalysis.withLangId(TextAnalysis.qualityScore(d))
      scored.filter(col("quality_score") >= 0.6 &&
        col("lang_guess").isin("en"))
    }
    // interleaved A/B: inline (current) vs count with agg over the same
    // predicate expressed once per row in a PROJECTION (CSE applies there)
    (1 to 3).foreach { i =>
      timed(s"filter_inline_$i")(inlineFilter(docs).count())
      timed(s"project_then_filter_$i") {
        val scored = TextAnalysis.withLangId(TextAnalysis.qualityScore(docs))
        // force the filter input through an aggregation-opaque projection:
        // count via sum(case when ...) so the predicate is evaluated in a
        // Project/Aggregate context where codegen CSE dedupes text_profile
        scored.select(
          sum(when(col("quality_score") >= 0.6 &&
            col("lang_guess").isin("en"), 1L).otherwise(0L)))
          .collect()(0).getLong(0)
      }
    }
    timed("curate_full")(Curate.curate(docs).count())
    timed("curate_full_again")(Curate.curate(docs).count())
    spark.stop()
  }
}
