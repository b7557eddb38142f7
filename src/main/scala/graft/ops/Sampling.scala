package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the reproducible subset/split
  * primitive of a training-data pipeline.
  *
  * Spark's `df.sample()` draws from a per-partition RNG: the selected set
  * changes with partitioning, task retries and row order, so a "10% sample"
  * is not a stable artifact. Hashing a KEY instead gives a sample that is a
  * pure function of the data — identical on every run, every engine, every
  * cluster size — and composes with incremental ingestion (a row's
  * membership never changes as the corpus grows). This is the standard
  * train/eval-split discipline at 100 TB.
  *
  * The hash is the 32-bit hex prefix of md5(key) — chosen over xxhash64
  * deliberately: md5 is bit-identical across engines (the DuckDB oracle
  * replays it verbatim), while xxhash64 implementations differ.
  */
object Sampling {

  /** Uniform bucket id in [0, buckets) from the md5 prefix of `key`. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Keep rows whose key hashes into `bucket` (of `buckets`) — a stable
    * 1/buckets sample. Codegen'd single filter; pushes no shuffle.
    */
  def hashSample(df: DataFrame, keyCol: String, buckets: Int,
                 bucket: Int = 0): DataFrame = {
    require(buckets > 0 && bucket >= 0 && bucket < buckets)
    df.filter(hashBucket(col(keyCol), buckets) === bucket.toLong)
  }

  /** Deterministic (train, eval) split: rows whose bucket (of 1000) falls
    * below `evalPermille` go to eval, the rest to train. Disjoint and
    * exhaustive by construction; membership is stable as the corpus grows.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                evalPermille: Int): (DataFrame, DataFrame) = {
    require(evalPermille >= 0 && evalPermille <= 1000)
    val b = hashBucket(col(keyCol), 1000)
    (df.filter(b >= evalPermille.toLong), df.filter(b < evalPermille.toLong))
  }

  /** Per-stratum quota sampling (domain/language rebalancing): keep a
    * deterministic `permille(stratum)`‰ of each stratum, `defaultPermille`‰
    * of everything else. A pure codegen'd filter — no shuffle, no window,
    * no per-stratum pass — because the quota only decides the hash
    * THRESHOLD, not a rank: membership stays a pure row function, so it is
    * partition-invariant, retry-stable and growth-stable exactly like
    * hashSample, and the strata can number in the millions without any
    * driver-side state beyond this map.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      permille: Map[String, Int], defaultPermille: Int = 0): DataFrame = {
    require((defaultPermille +: permille.values.toSeq)
      .forall(q => q >= 0 && q <= 1000))
    val quota = permille.foldLeft(when(lit(false), lit(0))) {
      case (acc, (s, q)) => acc.when(col(stratumCol) === s, lit(q))
    }.otherwise(lit(defaultPermille))
    df.filter(hashBucket(col(keyCol), 1000) < quota.cast("long"))
  }
}
