package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training docs that share word n-grams
  * with an evaluation/benchmark set (the standard leakage check before a
  * training run).
  *
  * Scale shape (corpus = 100 TB, benchmark = eval sets, i.e. SMALL):
  * benchmark n-grams are exploded, deduplicated and BROADCAST; the corpus
  * side explodes each doc's DISTINCT n-grams and map-side joins against the
  * broadcast set, so the only shuffle is the final per-doc hit count over
  * the few rows that actually matched — the 100 TB corpus itself never
  * shuffles. If the benchmark outgrows the broadcast threshold, drop the
  * explicit `broadcast()` and Spark falls back to a shuffled hash join on
  * the gram key, which is still postings-shaped (never all-pairs).
  */
object Contamination {

  /** Corpus docs sharing ≥ `minHits` distinct word `n`-grams with ANY
    * benchmark doc, with their hit count. Gram semantics are shared with
    * `TextAnalysis.wordNgrams` (lowercase, whitespace word split) so the
    * DuckDB oracle replays them verbatim.
    */
  def flagContaminated(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 3, minHits: Int = 1): DataFrame = {
    require(n >= 1 && minHits >= 1)
    val benchGrams = benchmark
      .select(explode(TextAnalysis.wordNgrams(col(benchTextCol), n)).as("gram"))
      .distinct()
    val corpusGrams = corpus.select(col(idCol),
      explode(array_distinct(TextAnalysis.wordNgrams(col(textCol), n))).as("gram"))
    corpusGrams
      .join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** The clean complement: corpus with contaminated docs removed (left-anti
    * on the flagged ids — the resume/except shape, one shuffle of ids only).
    */
  def dropContaminated(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 3, minHits: Int = 1): DataFrame = {
    val flagged = flagContaminated(corpus, idCol, textCol, benchmark,
      benchTextCol, n, minHits).select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
