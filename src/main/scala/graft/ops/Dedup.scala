package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines, each
  * designed so the expensive pairwise work only ever happens inside small
  * candidate buckets — the all-pairs cross join that kills 100 TB runs never
  * appears in any plan here.
  *
  *  - exact:     hash-groupBy (one shuffle on a 16-byte key)
  *  - MinHash:   shingle → k minhashes → b band-buckets → within-bucket
  *    pairs → Jaccard verify (the standard LSH recipe)
  *  - SimHash:   64-bit signature (custom codegen'd Expression) → 4×16-bit
  *    band buckets (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 band equal) → bit_count
  *    verify
  *  - embedding: cosine near-dup via sign-LSH buckets (Similarity.scala)
  */
object Dedup {

  import TextOps._

  /** Exact duplicate groups by content hash. Returns one row per duplicated
    * hash with the kept (min) id and the full sorted member list.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), md5(col(textCol)).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("n"), min(col("id")).as("keeper"),
        sort_array(collect_list(col("id"))).as("members"))
      .filter(col("n") > 1)

  /** Exact-dedup projection: keep one deterministic representative (min id)
    * per distinct text. Scale shape: single hash-shuffle on md5, map-side
    * partial agg.
    */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = df
      .groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__h")
    // the semi join keeps every row with a keeper id — fully identical rows
    // (same id, same text) still need collapsing to one physical row.
    df.join(keepers, Seq(idCol), "left_semi").dropDuplicates(Seq(idCol))
  }

  /** MinHash signature: k independent hash slots, each the array_min of
    * xxhash64(shingle, slot). Pure expressions — one projection, no UDF.
    */
  def minhashSig(shinglesCol: Column, k: Int): Column =
    array((0 until k).map(j =>
      array_min(transform(shinglesCol, s => xxhash64(s, lit(j))))): _*)

  /** MinHash/LSH near-duplicate pairs with verified shingle-Jaccard.
    *
    * @param bands  b band buckets of r = k/bands rows each; a pair collides
    *               iff some band's r minhashes all match (P ≈ 1-(1-s^r)^b).
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, k: Int = 48, bands: Int = 16,
                      threshold: Double = 0.6): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val withSig = df
      .select(col(idCol).as("id"),
        shingles(tokens(col(textCol)), shingleN).as("sh"))
      .withColumn("sig", minhashSig(col("sh"), k))
    // band keys: hash the slice of r minhashes per band; explode → bucket.
    val banded = withSig.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map(bd =>
        xxhash64(concat_ws(",", slice(col("sig"), bd * r + 1, r)), lit(bd))): _*))
        .as(Seq("band", "bucket")))
    // within-bucket candidate pairs (self-join on the bucket key — AQE
    // handles residual skew; bucket sizes are small by LSH construction).
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(array_distinct(col("sh_a")), array_distinct(col("sh_b"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy("id_a", "id_b").agg(first("jaccard").as("jaccard"))
  }

  /** SimHash near-duplicate pairs: hamming(sig_a, sig_b) <= maxHamming.
    * Pigeonhole banding on 4×16-bit chunks guarantees no false negatives
    * for maxHamming <= 3.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      GraftFunctions.simhash64(tokens(col(textCol))).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(bd =>
        shiftrightunsigned(col("sig"), bd * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "chunk")))
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  /** n-gram Jaccard similarity for explicit candidate pairs (brute variant
    * used as the LSH recall oracle in tests; bounded by `sampleMod` so the
    * pair count stays ~|df|²/mod).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, threshold: Double = 0.5,
                        sampleMod: Int = 1): DataFrame = {
    val t = df.select(col(idCol).as("id"),
      array_distinct(shingles(tokens(col(textCol)), shingleN)).as("sh"))
    val left = t.filter(pmod(col("id"), lit(sampleMod)) === 0)
      .select(col("id").as("id_a"), col("sh").as("sh_a"))
    val right = t.select(col("id").as("id_b"), col("sh").as("sh_b"))
    left.crossJoin(right)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
