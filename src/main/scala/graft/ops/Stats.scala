package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling — the "data card" reporting stage of a training-data
  * pipeline: per-source composition and token-length shape, published next
  * to every curated snapshot. Pure aggregates (one hash shuffle whose
  * output is bounded by #sources / #bins, never corpus size), all
  * arithmetic fixed-order and 6-dp-rounded so the DuckDB oracle replays it
  * exactly.
  */
object Stats {

  // one TextProfile byte scan, no regex / match-array allocation (r6);
  // n_tokens ≡ size(regexp_extract_all(t, "\S+")) by the TextProfile
  // equivalence contract
  private def nTok(textCol: String) =
    graft.functions.GraftFunctions.text_profile(col(textCol))
      .getField("n_tokens").cast("long")

  /** Per-source profile: docs, token totals, mean/max tokens, chars. */
  def corpusProfile(df: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame =
    df.select(col(sourceCol).as("source"), nTok(textCol).as("n"),
        length(col(textCol)).cast("long").as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        round(sum(col("n")).cast("double") / count(lit(1)), 6)
          .as("mean_tokens"),
        max(col("n")).as("max_tokens"),
        sum(col("c")).as("total_chars"))

  /** Fixed-width token-length histogram: bin = floor(n_tokens / binWidth),
    * overflow clamped into the last bin. Emits only non-empty bins (join
    * against a bin spine downstream if dense output is needed).
    */
  def tokenLengthHistogram(df: DataFrame, textCol: String = "text",
      binWidth: Int = 10, maxBins: Int = 20): DataFrame = {
    require(binWidth >= 1 && maxBins >= 1)
    df.select(least(floor(nTok(textCol) / lit(binWidth.toDouble)),
        lit(maxBins - 1L)).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("bin_lo", (col("bin") * binWidth).cast("long"))
      .select(col("bin"), col("bin_lo"), col("n_docs"))
  }

  /** Per-source token-length quantiles (p50/p90/p99) — the data-card
    * shape metric next to `corpusProfile`'s means. EXACT linear-interp
    * percentile (≡ DuckDB quantile_cont on the same integers, rounded
    * 6 dp): per-group state is the group's value list, fine for
    * #sources-bounded groups; at 100 TB with huge groups switch the same
    * call to `percentile_approx` (bounded sketch) — the documented
    * exact/approx pairing, same as q12's distinct vs q49's HLL.
    */
  def tokenQuantiles(df: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame =
    df.select(col(sourceCol).as("source"), nTok(textCol).as("n"))
      .groupBy(col("source"))
      .agg(
        round(expr("percentile(n, 0.5)"), 6).as("p50"),
        round(expr("percentile(n, 0.9)"), 6).as("p90"),
        round(expr("percentile(n, 0.99)"), 6).as("p99"))

  /** Exact top-k corpus terms (heavy hitters) with a deterministic
    * tie-break (count desc, term asc). The explode inflates rows to one
    * per token, but partial (map-side) aggregation compacts each partition
    * to its distinct terms before the one hash shuffle, and the final
    * ranking is a TakeOrderedAndProject — per-partition top-k heaps, no
    * Window, no global sort. Vocabulary, not corpus, bounds the shuffle.
    */
  def topTerms(df: DataFrame, textCol: String = "text",
      k: Int = 25): DataFrame = {
    require(k >= 1)
    df.select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)
  }
}
