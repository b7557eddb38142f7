package graft

import graft.ops._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for individual operator queries (tuning tool).
  * Current experiment: where does lang-id / q61 time go — repeated
  * regex-count subtrees (does codegen CSE dedupe them?), the
  * regexp_extract_all array allocation vs regexp_count, and the curate
  * chain end-to-end.
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

    def hitsEx(c: Column, pat: String): Column =
      size(regexp_extract_all(lower(c), lit(pat), lit(0)))
    def hitsCnt(c: Column, pat: String): Column =
      regexp_count(lower(c), lit(pat)).cast("int")

    val pats = TextAnalysis.stopwordPatterns
    // 1 regex, extract_all vs count
    timed("one_extract_all")(
      docs.select(sum(hitsEx(col("text"), pats.head._2))).collect()(0))
    timed("one_regexp_count")(
      docs.select(sum(hitsCnt(col("text"), pats.head._2))).collect()(0))
    // all 4, evaluated once each
    timed("four_extract_all")(docs.select(
      sum(pats.map(p => hitsEx(col("text"), p._2)).reduce(_ + _))).collect()(0))
    timed("four_regexp_count")(docs.select(
      sum(pats.map(p => hitsCnt(col("text"), p._2)).reduce(_ + _))).collect()(0))
    // the shipped langId (potentially O(L^2) duplicated subtrees — or CSE'd?)
    timed("withLangId_shipped")(
      TextAnalysis.withLangId(docs).groupBy("lang_guess").count().collect().length)
    timed("langid_only")(
      docs.select(TextAnalysis.langId(col("text")).as("l"))
        .groupBy("l").count().collect().length)
    // counts-array argmax variant (each regex once per row, argmax in SQL)
    val counts = array(pats.map(p => hitsCnt(col("text"), p._2)): _*)
    val langs = array(pats.map(p => lit(p._1)): _*)
    val argmaxLang = {
      val best = array_max(col("__c"))
      when(best === 0, lit("und")).otherwise(
        element_at(col("__l"), array_position(col("__c"), best).cast("int")))
    }
    timed("langid_array_argmax")(
      docs.withColumn("__c", counts).withColumn("__l", langs)
        .select(argmaxLang.as("l")).groupBy("l").count().collect().length)
    // quality score alone, then the full curate chain
    timed("qualityScore")(
      TextAnalysis.qualityScore(docs).agg(sum("quality_score")).collect()(0))
    timed("curate_full")(Curate.curate(docs).count())
    timed("curate_full_again")(Curate.curate(docs).count())
    spark.stop()
  }
}
