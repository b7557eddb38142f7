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
}
