package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text primitives for the training-data operators: tokenization and
  * shingling as pure Catalyst expressions (no UDFs — everything stays inside
  * WholeStageCodegen and pushes projections to the scan).
  */
object TextOps {

  /** Word tokens: lowercase \w+ runs. regexp_extract_all (not split) so
    * leading/trailing separators never yield empty tokens — keeps parity
    * with the DuckDB oracle exact.
    */
  def tokens(c: Column): Column = regexp_extract_all(lower(c), lit("""\w+"""), lit(0))

  /** Word n-gram shingles over the token array, via sequence+transform+slice
    * (higher-order functions, codegen'd; no explode → no row blowup).
    */
  def shingles(tokensCol: Column, n: Int): Column =
    when(size(tokensCol) >= n,
      transform(
        sequence(lit(0), size(tokensCol) - n),
        i => concat_ws(" ", slice(tokensCol, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", tokensCol)))

  /** Jaccard similarity of two string-array SETS. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Token-budget document chunking (the pre-training packing primitive):
    * split each doc's whitespace words into chunks of ≤ `maxTokens` with
    * `overlap` tokens shared between consecutive chunks. One narrow
    * projection + one generator — chunk starts are computed as a whole-array
    * `sequence`, the text is re-assembled per start with `slice`, and
    * `posexplode` emits (chunk_idx, chunk). Row inflation is the operator's
    * contract (≈ input/maxTokens), there is NO shuffle, and nothing is
    * buffered per doc beyond its own word array — scales to any corpus.
    * Whitespace-empty docs are dropped (no token, no chunk).
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1 && overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val step = maxTokens - overlap
    val w = split(trim(lower(col(textCol))), """\s+""")
    // last start must introduce ≥1 NEW token (start ≤ len − overlap), and
    // the stop is clamped to ≥1 because Spark's sequence() DESCENDS when
    // stop < start (short docs yield exactly one chunk)
    val starts = sequence(lit(1),
      greatest(size(w) - lit(overlap), lit(1)), lit(step))
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), posexplode(
        transform(starts, s => concat_ws(" ", slice(w, s, lit(maxTokens))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
      .withColumn("n_tokens",
        size(split(col("chunk"), """\s+""")))
  }

  /** Sequence packing (the GPT-style "concatenate then fill" recipe):
    * documents are concatenated into a deterministic per-shard stream and
    * each doc is assigned the fixed-token-budget pack its FIRST token
    * falls into — pack = floor(start_offset / tokensPerPack), start_offset
    * = running token total of all earlier docs in the shard. Docs may
    * straddle pack boundaries (q56's chunker splits them downstream); what
    * this operator provides is the deterministic grouping that fills every
    * training sequence to the budget with no per-pack fragmentation loss.
    *
    * Scale shape: the only shuffle is the hash repartition to `nShards`
    * md5 shards; the running total is a cumulative-sum window ordered by id
    * WITHIN each shard, so per-task state is one counter and nShards just
    * has to exceed the cluster's parallelism (packing quality is
    * unaffected — every shard's packs are internally dense). Shard and
    * order are pure functions of the ids: partition/retry-stable,
    * engine-replayable.
    *
    * @return (idCol, shard, pack, n_tokens)
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      tokensPerPack: Int, nShards: Int): DataFrame = {
    require(tokensPerPack >= 1 && nShards >= 1)
    // one TextProfile byte scan (r6); ≡ size(regexp_extract_all(t, "\S+"))
    val nTok = graft.functions.GraftFunctions.text_profile(col(textCol))
      .getField("n_tokens").cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
    df.select(col(idCol), nTok.as("n_tokens"),
        Sampling.hashBucket(col(idCol), nShards).as("shard"))
      // both engines evaluate floor((long - long) / double) on identical
      // IEEE doubles; all offsets nonnegative, so floor ≡ truncation
      .withColumn("pack",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) /
          lit(tokensPerPack.toDouble)).cast("long"))
  }
}
