package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded distinct-set aggregator (SURVEY.md O25): `collect_set` with a
  * hard cardinality cap — alco's Redis SADD filter-value cache, which in
  * practice needs a bound so one high-cardinality column can't blow up the
  * rollup state. Keeps the `maxSize` SMALLEST values (deterministic — a
  * plain "first maxSize seen" would depend on partition order and break
  * run-to-run equality).
  *
  * A typed `Aggregator` (the public UDAF surface): merge is associative/
  * commutative, state is O(maxSize) regardless of input rows — safe at
  * 10^12 rows. Buffer is a sorted distinct Seq (Catalyst-encodable; no
  * opaque Kryo blobs).
  */
class BoundedCollectSet(maxSize: Int)
  extends Aggregator[String, Seq[String], Seq[String]] {

  override def zero: Seq[String] = Seq.empty

  override def reduce(b: Seq[String], a: String): Seq[String] =
    if (a == null || (b.length == maxSize && b.last <= a)) b
    else {
      // b stays sorted-distinct by construction: one linear splice, never a
      // per-row re-sort (O(k) vs O(k log k) on the hot update path).
      val (lt, ge) = b.span(_ < a)
      if (ge.headOption.contains(a)) b
      else (lt ++ (a +: ge)).take(maxSize)
    }

  override def merge(b1: Seq[String], b2: Seq[String]): Seq[String] =
    (b1 ++ b2).distinct.sorted.take(maxSize)

  override def finish(r: Seq[String]): Seq[String] = r

  override def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

object BoundedCollectSet {
  /** Column-API form: bounded_collect_set(col, n). */
  def bounded_collect_set(c: Column, maxSize: Int): Column =
    udaf(new BoundedCollectSet(maxSize), Encoders.STRING).apply(c)
}
