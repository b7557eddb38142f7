package graft

import graft.ops._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for individual operator queries (tuning tool). */
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val hashed = docs.select(col("doc_id").as("id"),
      Dedup.shingleHashes(col("text"), 3).as("shh"))
    timed("hash_only")(hashed.count())
    val withSig = hashed.withColumn("sig", Dedup.minhashSig(col("shh"), 32))
    timed("sig")(withSig.count())
    val r = 4
    val banded = withSig.select(col("id"),
      posexplode(array((0 until 8).map(bd =>
        xxhash64(slice(col("sig"), bd * r + 1, r), lit(bd))): _*))
        .as(Seq("band", "bucket")))
    timed("banded")(banded.count())
    val banded2 = withSig
      .withColumn("bandkeys", array((0 until 8).map(bd =>
        xxhash64(slice(col("sig"), bd * r + 1, r), lit(bd))): _*))
      .select(col("id"), posexplode(col("bandkeys")).as(Seq("band", "bucket")))
    timed("banded2_column_first")(banded2.count())
    val sigMat = withSig.localCheckpoint()
    timed("banded_after_ckpt") {
      sigMat.select(col("id"),
        posexplode(array((0 until 8).map(bd =>
          xxhash64(slice(col("sig"), bd * r + 1, r), lit(bd))): _*))
          .as(Seq("band", "bucket"))).count()
    }
    println("PLAN banded:\n" + banded.queryExecution.executedPlan.toString().take(4000))
    val pairs = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    timed("pairs_raw")(pairs.count())
    timed("pairs_distinct")(pairs.distinct().count())
    timed("full_q22")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 32, 8, 0.3).count())
    timed("full_q22_again")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 32, 8, 0.3).count())
    spark.stop()
  }
}
