package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 scale-cliff check (VERDICT r5 #4 asked for an sf1 pass; no sf1
  * tier exists in this sandbox — /root/testdata has sf0.001/0.01/0.1 only —
  * so the heavy operators are driven at 10×/20× sf0.1 volume on inflated
  * copies instead: same data shapes, shifted ids, text salted per copy so
  * dedup/similarity ops see realistic near-duplicate structure instead of
  * 10 exact copies of everything).
  *
  * Not part of the driver contract; wall times land in BASELINE.md. A scale
  * cliff here = an op whose time grows superlinearly in the inflation
  * factor (bucket blowup, AQE switch point, codegen limit) — each op prints
  * at 1× and 10× so the ratio is read directly.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 4, 16).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (32 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALECHECK $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // inflate ×k: ids shifted per copy; ~30% of copies keep the original
    // text (near/exact-dup structure), the rest get a copy-salt token so
    // the dedup ops do real discrimination work at scale
    def inflate(df: DataFrame, k: Int, idCol: String): DataFrame =
      (0 until k).map { i =>
        val d = df.withColumn(idCol, col(idCol) + lit(i * 10000000L))
        if (i == 0 || i % 3 == 0) d
        else d.withColumn("text", concat(col("text"), lit(s" salt$i")))
      }.reduce(_ unionByName _)

    // SPARK_GRAFT_SCALE_ONLY=emb reruns just the embeddings section
    val embOnly = sys.env.get("SPARK_GRAFT_SCALE_ONLY").contains("emb")

    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val docs10 = if (embOnly) docs1 else inflate(docs1, 10, "doc_id").localCheckpoint()
    val lined1 = graft.alco.Gen.linedDocs(spark, 4000L).localCheckpoint()
    val lined10 = if (embOnly) lined1 else graft.alco.Gen.linedDocs(spark, 40000L).localCheckpoint()
    println(s"SCALECHECK corpus docs1=${docs1.count()} docs10=${docs10.count()}")

    for ((tag, d) <- if (embOnly) Seq.empty else Seq("1x" -> docs1, "10x" -> docs10)) {
      timed(s"q21_jaccard_pairs_$tag") {
        val sets = d.select(col("doc_id").as("id"),
          array_distinct(TextOps.tokens(col("text"))).as("sh"))
        Dedup.jaccardPairsFromSets(sets, threshold = 0.499999, sampleMod = 7)
          .filter(round(col("jaccard"), 6) >= 0.5).count()
      }
      timed(s"q22_minhash_lsh_$tag") {
        Dedup.minhashNearDups(d, "doc_id", "text",
          shingleN = 3, k = 32, bands = 8, threshold = 0.3).count()
      }
      timed(s"q46_components_$tag") {
        val sets = d.select(col("doc_id").as("id"),
          array_distinct(TextOps.tokens(col("text"))).as("sh"))
        val pairs = Dedup.jaccardPairsFromSets(sets, 0.499999, 7)
          .filter(round(col("jaccard"), 6) >= 0.5)
        Dedup.connectedComponents(pairs.select(col("id_a"), col("id_b"))).count()
      }
      timed(s"q61_curate_$tag")(Curate.curate(d).count())
      timed(s"q63_pack_$tag")(noop(
        TextOps.packSequences(d, "doc_id", "text", 64, 8)))
      timed(s"q66_dedup_incremental_$tag") {
        val batch = d.filter(col("doc_id") % 3 === 0)
          .withColumn("doc_id", col("doc_id") + 100000000L)
        Dedup.dropSeenExact(batch, d, "doc_id", "text").count()
      }
      timed(s"q71_top_terms_$tag")(noop(Stats.topTerms(d, k = 25)))
      timed(s"q57_surprisal_$tag")(noop(
        TextAnalysis.unigramSurprisal(d, "doc_id")))
    }
    for ((tag, d) <- if (embOnly) Seq.empty
                     else Seq("1x" -> lined1, "10x" -> lined10))
      timed(s"q58_line_dedup_$tag")(noop(
        Dedup.dropBoilerplateLines(d, "doc_id", "text", minDocFreq = 10)))

    // embeddings: 1× vs 4× (quadratic-risk ops — bucket-bounded by design)
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet").localCheckpoint()
    val emb4 = (0 until 4).map(i =>
        emb1.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _).localCheckpoint()
    for ((tag, e) <- Seq("1x" -> emb1, "4x" -> emb4)) {
      timed(s"q38_cos_neardup_$tag")(
        Similarity.cosineNearDupsAuto(e, threshold = 0.2).count())
      timed(s"q60_semdedup_$tag")(
        Similarity.semDedup(e, tau = 0.2, nlist = 16).count())
      timed(s"q24_ann_brute_$tag")(noop(
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), 5)))
    }
    spark.stop()
  }
}
