package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k as a hash-aggregable TypedImperativeAggregate: keeps the k
  * `value` rows with the SMALLEST `ordering` (ascending; wrap a struct with
  * a negated score for descending), returned as an array sorted ascending.
  *
  * This is the scale-correct replacement for the
  * `row_number().over(Window.partitionBy(query))` top-k ranking pattern: a
  * window funnels EVERY scored row through a shuffle into #groups partitions
  * and sorts them (at a 10^12-row corpus that is the whole corpus through
  * one sort), while this aggregate keeps a k-row bounded buffer per group
  * with map-side partial collapse — shuffle volume is #groups × k rows, and
  * nothing ever sorts more than 2k elements at a time. Runs in
  * ObjectHashAggregateExec (true hash aggregation), like MaxByRow.
  *
  * Buffer = at most 2k UnsafeRow `struct(ordering, value)` pairs, compacted
  * to the k smallest whenever it fills (amortized O(log k) per row); once
  * saturated, rows not beating the current k-th bound are rejected O(1).
  */
case class TopKRows(
    value: Expression,
    ordering: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRows.Buffer] {

  require(k > 0, "top-k requires k > 0")

  override def children: Seq[Expression] = Seq(value, ordering)
  override def dataType: DataType = ArrayType(value.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_rows"

  @transient private lazy val ordCmp =
    TypeUtils.getInterpretedOrdering(ordering.dataType)
  @transient private lazy val pairProj =
    UnsafeProjection.create(Array(ordering.dataType, value.dataType))
  @transient private lazy val pairRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

  @transient private lazy val cmp: Ordering[UnsafeRow] =
    (a: UnsafeRow, b: UnsafeRow) =>
      ordCmp.compare(a.get(0, ordering.dataType), b.get(0, ordering.dataType))

  private def add(buf: TopKRows.Buffer, row: UnsafeRow): Unit = {
    if (buf.bound == null || cmp.compare(row, buf.bound) < 0) {
      buf.rows += row
      if (buf.rows.length >= 2 * k) compact(buf)
    }
  }

  private def compact(buf: TopKRows.Buffer): Unit =
    if (buf.rows.length > k) {
      val keep = buf.rows.toArray.sorted(cmp).take(k)
      buf.rows.clear()
      buf.rows ++= keep
      buf.bound = keep.last
    }

  override def createAggregationBuffer(): TopKRows.Buffer =
    new TopKRows.Buffer

  override def update(buf: TopKRows.Buffer, input: InternalRow): TopKRows.Buffer = {
    val ord = ordering.eval(input)
    if (ord != null) {
      pairRow.update(0, ord)
      pairRow.update(1, value.eval(input))
      // bound check against the projected row (cheap: one compare) happens
      // in add(); copy only when the row is actually retained.
      val projected = pairProj(pairRow)
      if (buf.bound == null || cmp.compare(projected, buf.bound) < 0)
        add(buf, projected.copy())
    }
    buf
  }

  override def merge(b1: TopKRows.Buffer, b2: TopKRows.Buffer): TopKRows.Buffer = {
    b2.rows.foreach(add(b1, _))
    b1
  }

  override def eval(buf: TopKRows.Buffer): Any = {
    val sorted = buf.rows.toArray.sorted(cmp).take(k)
    new GenericArrayData(sorted.map(_.get(1, value.dataType)))
  }

  override def serialize(buf: TopKRows.Buffer): Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.rows.length)
    buf.rows.foreach { row =>
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRows.Buffer = {
    val buf = new TopKRows.Buffer
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    (0 until n).foreach { _ =>
      val len = in.getInt
      val arr = new Array[Byte](len)
      in.get(arr)
      val row = new UnsafeRow(2)
      row.pointTo(arr, len)
      buf.rows += row
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKRows =
    copy(value = newChildren(0), ordering = newChildren(1))
}

object TopKRows {

  /** Mutable holder: retained pair rows plus the current k-th-smallest bound
    * (null until the first compaction).
    */
  final class Buffer {
    val rows: mutable.ArrayBuffer[UnsafeRow] = mutable.ArrayBuffer.empty
    var bound: UnsafeRow = _
  }

  def top_k_rows(value: Column, ordering: Column, k: Int): Column =
    ColumnBridge.column(
      TopKRows(ColumnBridge.expression(value), ColumnBridge.expression(ordering), k)
        .toAggregateExpression())
}
