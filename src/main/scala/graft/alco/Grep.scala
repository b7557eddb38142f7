package graft.alco

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The "grep" query surface (SURVEY.md §3 E2) — alco's Django search app
  * rebuilt over the routed table: full-text match, attribute IN filters,
  * date-range pruning, stable ordering, pagination, and the ±N context view.
  *
  * Sphinx's inverted index is replaced by codegen'd token predicates over a
  * columnar scan; the manual shard-list math is replaced by Catalyst
  * partition pruning on the `day` partition column (free). The Column API
  * is injection-free by construction (alco needed SphinxQL escaping [PK]).
  */
object Grep {

  sealed trait MatchMode
  case object MatchAny extends MatchMode // Sphinx OR
  case object MatchAll extends MatchMode // Sphinx AND
  case object MatchPhrase extends MatchMode // Sphinx "phrase"

  final case class Query(
      terms: Seq[String] = Nil,
      mode: MatchMode = MatchAny,
      filters: Map[String, Seq[String]] = Map.empty, // attr IN (…)
      tsFrom: Option[Timestamp] = None,
      tsTo: Option[Timestamp] = None,
      limit: Int = 100,
      offset: Int = 0)

  private def tokens(c: Column): Column = split(lower(c), "\\W+")

  /** Token-containment predicate over `text` (O14). */
  def matchPredicate(terms: Seq[String], mode: MatchMode): Column = {
    if (terms.isEmpty) return lit(true)
    val lowered = terms.map(_.toLowerCase)
    mode match {
      case MatchAny =>
        arrays_overlap(tokens(col("text")), array(lowered.map(lit): _*))
      case MatchAll =>
        lowered.map(t => array_contains(tokens(col("text")), t))
          .reduce(_ && _)
      case MatchPhrase =>
        lower(col("text")).contains(lowered.mkString(" "))
    }
  }

  private def predicates(q: Query): Column = {
    val attr = q.filters.map { case (c, vs) => col(c).isin(vs: _*) }
      .foldLeft(lit(true))(_ && _)
    val range = (q.tsFrom, q.tsTo) match {
      case (Some(a), Some(b)) =>
        // day bounds first → partition pruning; ts bounds for exactness.
        col("day").between(to_date(lit(a)), to_date(lit(b))) &&
          col("ts").between(lit(a), lit(b))
      case (Some(a), None) => col("day") >= to_date(lit(a)) && col("ts") >= lit(a)
      case (None, Some(b)) => col("day") <= to_date(lit(b)) && col("ts") <= lit(b)
      case _ => lit(true)
    }
    matchPredicate(q.terms, q.mode) && attr && range
  }

  /** Run a grep query over the routed table. Ordering is newest-first with
    * the stable seq tiebreak (alco: ts DESC, seq DESC) — a distributed
    * top-k (`TakeOrderedAndProjectExec`) when offset == 0, never a global
    * sort.
    */
  def query(spark: SparkSession, routedPath: String, q: Query): DataFrame = {
    val base = spark.read.parquet(routedPath).filter(predicates(q))
    if (q.offset == 0) base.orderBy(col("ts").desc, col("seq").desc).limit(q.limit)
    else {
      // Offset pagination (rare path): bounded top-(offset+limit) first so
      // the row_number window sees only offset+limit rows, not the table.
      val w = Window.orderBy(col("ts").desc, col("seq").desc)
      base.orderBy(col("ts").desc, col("seq").desc).limit(q.offset + q.limit)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") > q.offset)
        .drop("__rn")
    }
  }

  /** Pagination total (alco: Sphinx total_found, bounded by max_matches). */
  def total(spark: SparkSession, routedPath: String, q: Query,
            maxMatches: Option[Int] = None): Long =
    Agg.matchCount(spark.read.parquet(routedPath).filter(predicates(q)), maxMatches)

  /** Context view (O28): the ±n turns around a hit within its conversation
    * (alco: neighboring loglines in the same context group).
    */
  def context(spark: SparkSession, routedPath: String, convId: String,
              turnIdx: Int, n: Int): DataFrame =
    spark.read.parquet(routedPath)
      .filter(col("conv_id") === convId &&
        col("turn_idx").between(turnIdx - n, turnIdx + n))
      .orderBy(col("turn_idx"))

  /** Windowed variant used by the operator inventory (lag/lead frame): each
    * row with its neighboring texts inside the conversation.
    */
  def withNeighbors(routed: DataFrame, n: Int = 1): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    routed
      .withColumn("prev_text", lag(col("text"), n).over(w))
      .withColumn("next_text", lead(col("text"), n).over(w))
  }
}
