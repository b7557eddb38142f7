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

  /** Temperature-based domain rebalancing (the multilingual-LM / Pile
    * mixing recipe): domain d with n_d rows gets mixing weight
    * w_d = n_d^alpha / Σ_e n_e^alpha and sampling rate
    * min(1, targetTotal·w_d / n_d) — alpha = 1 reproduces the natural
    * distribution, alpha = 0 flattens to equal rows per domain, values
    * between upweight the tail. Unlike `stratifiedSample` the quotas are
    * COMPUTED from the corpus, so no caller-side domain map is needed and
    * the domain cardinality can be millions.
    *
    * Scale shape: one count aggregate on the domain column (output = one
    * row per domain), the tiny rate table broadcast back, and membership is
    * the same md5 micro-bucket rule as `hashSample` evaluated map-side —
    * the corpus itself never shuffles. Rates are rounded to 6 dp before
    * thresholding so a libm ULP difference (pow) between engines cannot
    * flip a row. Rows with a NULL domain carry no weight and are dropped.
    * Membership is partition/retry-stable; it shifts with corpus growth
    * only insofar as the computed rates shift.
    */
  def temperatureResample(df: DataFrame, keyCol: String, domainCol: String,
      alpha: Double, targetTotal: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0,1]")
    require(targetTotal > 0)
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__nd"))
    val z = counts.agg(sum(pow(col("__nd"), alpha)).as("__z"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col(domainCol),
        round(least(lit(1.0), lit(targetTotal.toDouble) *
          pow(col("__nd"), alpha) / col("__z") / col("__nd")), 6).as("__rate"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(hashBucket(col(keyCol), 1000000) <
        round(col("__rate") * 1e6).cast("long"))
      .drop("__rate")
  }

  /** Epoch-weighted mixture resampling — the missing UPsampling half of
    * the mixing recipe (`temperatureResample` can only thin a domain;
    * real data-mix specs say "2.3 epochs of wiki, 0.5 of web"). Each row
    * of domain d with weight e_d is emitted floor(e_d) times plus one
    * more iff its md5 micro-bucket falls below frac(e_d) — so a domain's
    * expected output is exactly e_d × its rows, deterministically (pure
    * row function: partition/retry/growth-stable, bit-identical across
    * engines). Emitted copies carry a `copy` index (0-based) so downstream
    * packing/shuffling can decorrelate repeats (e.g. salt the training
    * order with it); dedup ops must run BEFORE this, not after.
    *
    * Scale shape: one broadcast of the tiny (domain → weight) table and
    * one generator projection (`explode(sequence(...))`) — the corpus
    * never shuffles, and output size is Σ e_d·n_d by construction.
    * Weights are pre-rounded to 6 dp so a ULP cannot flip a copy count.
    * Domains absent from `epochs` default to weight 0 (dropped), keeping
    * the spec explicit about what enters the mix.
    */
  def mixtureResample(df: DataFrame, keyCol: String, domainCol: String,
      epochs: Map[String, Double], defaultEpochs: Double = 0.0): DataFrame = {
    require((defaultEpochs +: epochs.values.toSeq).forall(e => e >= 0.0),
      "epoch weights must be >= 0")
    val micro = epochs.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (d, e)) =>
        acc.when(col(domainCol) === d, lit(math.round(e * 1e6)))
    }.otherwise(lit(math.round(defaultEpochs * 1e6)))
    val whole = (micro / 1000000L).cast("long")
    val extra = when(
      hashBucket(col(keyCol), 1000000) < pmod(micro, lit(1000000L)), 1L)
      .otherwise(0L)
    df.withColumn("__copies", whole + extra)
      .filter(col("__copies") > 0)
      .withColumn("copy",
        explode(sequence(lit(0), (col("__copies") - 1L).cast("int"))))
      .drop("__copies")
  }
}
