package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for individual operator queries (tuning tool).
  * Round-6 experiment: phrase match — the replaced
  * `lower(text).rlike("\\bspark\\W+table\\b")` regex pass vs the codegen'd
  * single-byte-scan PhraseMatch, interleaved A/B at 500k docs.
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
    // inflate ×100 for signal (sf0.1 = 5k docs → 500k rows)
    val docs = (0 until 100).map(i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_.unionByName(_)).localCheckpoint()
    timed("scan_only")(docs.count())

    def rlikePhrase(d: DataFrame, terms: Seq[String]): DataFrame = {
      val pat = terms.map(_.toLowerCase).map(java.util.regex.Pattern.quote)
        .mkString("\\b", "\\W+", "\\b")
      d.filter(lower(col("text")).rlike(pat))
    }
    def fastPhrase(d: DataFrame, terms: Seq[String]): DataFrame =
      d.filter(graft.functions.GraftFunctions.phrase_match(col("text"),
        terms.map(_.toLowerCase)))

    val terms = Seq("spark", "table")
    (1 to 4).foreach { i =>
      timed(s"phrase_rlike_$i")(rlikePhrase(docs, terms).count())
      timed(s"phrase_bytescan_$i")(fastPhrase(docs, terms).count())
    }
    spark.stop()
  }
}
