package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Hash-aggregable last-write-wins: keeps the `value` row whose `ordering`
  * struct is greatest (REPLACE INTO semantics, SURVEY.md O34).
  *
  * Why not the built-in `max_by`? Its aggregation buffer is a struct, which
  * `HashAggregateExec` cannot hold in its fixed-width mutable buffer —
  * Catalyst silently falls back to **SortAggregate**, i.e. a full sort on
  * BOTH sides of the dedup shuffle (caught by PlanSpec). At 10^12 rows
  * that sort is the difference between a streaming hash update and a
  * spill-heavy O(n log n) pass. A `TypedImperativeAggregate` runs in
  * `ObjectHashAggregateExec`: true hash aggregation with map-side partial
  * collapse and zero sorts.
  *
  * Buffer = one UnsafeRow `struct(ordering, value)` (flat bytes —
  * serialize is just `getBytes`).
  */
case class MaxByRow(
    value: Expression,
    ordering: Expression,
    reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MaxByRow.Buffer] {

  override def children: Seq[Expression] = Seq(value, ordering)
  override def dataType: DataType = value.dataType
  override def nullable: Boolean = true
  override def prettyName: String = if (reverse) "min_by_row" else "max_by_row"

  // reverse=true keeps the LEAST ordering (min_by) — same buffer, same
  // ObjectHashAggregate path, flipped comparison
  private def wins(cmp: Int): Boolean = if (reverse) cmp < 0 else cmp > 0

  @transient private lazy val ordCmp =
    TypeUtils.getInterpretedOrdering(ordering.dataType)
  // ONE generated projection evaluates (ordering, value) straight off the
  // input row into an UnsafeRow pair (r6, guide §1.2 order-of-operations
  // step 2): the previous update path ran ordering.eval + value.eval
  // interpreted — each CreateNamedStruct.eval allocates a boxed
  // GenericInternalRow per input row — and then re-serialized both through
  // a second projection. With near-unique dedup keys every input row takes
  // the "first row of its group" path, so this is per-ROW cost on the
  // pipeline's one data shuffle, not per-group.
  @transient private lazy val pairProj =
    UnsafeProjection.create(Seq(ordering, value))

  override def createAggregationBuffer(): MaxByRow.Buffer = new MaxByRow.Buffer

  override def update(buf: MaxByRow.Buffer, input: InternalRow): MaxByRow.Buffer = {
    val pair = pairProj(input)
    if (!pair.isNullAt(0)) {
      if (buf.row == null) buf.set(pair.copy(), ordering.dataType)
      else {
        val ord = pair.get(0, ordering.dataType)
        if (wins(ordCmp.compare(ord, buf.ord))) buf.set(pair.copy(), ordering.dataType)
      }
    }
    buf
  }

  override def merge(b1: MaxByRow.Buffer, b2: MaxByRow.Buffer): MaxByRow.Buffer = {
    if (b2.row != null) {
      b2.materialize(ordering.dataType)
      if (b1.row == null || wins(ordCmp.compare(b2.ord, b1.ord))) {
        b1.set(b2.row, ordering.dataType)
      }
    }
    b1
  }

  override def eval(buf: MaxByRow.Buffer): Any =
    if (buf.row == null) null else buf.row.get(1, value.dataType)

  override def serialize(buf: MaxByRow.Buffer): Array[Byte] =
    if (buf.row == null) Array.emptyByteArray else buf.row.getBytes

  override def deserialize(bytes: Array[Byte]): MaxByRow.Buffer = {
    val buf = new MaxByRow.Buffer
    if (bytes.nonEmpty) {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      buf.row = row // ord materialized lazily on first compare
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MaxByRow =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaxByRow =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MaxByRow =
    copy(value = newChildren(0), ordering = newChildren(1))
}

object MaxByRow {
  /** Mutable holder: the stored UnsafeRow pair plus the cached ordering
    * value (extracted once per buffer for comparisons).
    */
  final class Buffer {
    var row: UnsafeRow = _
    var ord: Any = _
    def set(r: UnsafeRow, ordType: DataType): Unit = { row = r; ord = r.get(0, ordType) }
    def materialize(ordType: DataType): Unit =
      if (ord == null && row != null) ord = row.get(0, ordType)
  }

  def max_by_row(value: Column, ordering: Column): Column =
    ColumnBridge.column(
      MaxByRow(ColumnBridge.expression(value), ColumnBridge.expression(ordering))
        .toAggregateExpression())

  /** Hash-aggregable min_by: the FIRST-write-wins / deterministic-keeper
    * twin (exact dedup keeps the min-id row per distinct text). */
  def min_by_row(value: Column, ordering: Column): Column =
    ColumnBridge.column(
      MaxByRow(ColumnBridge.expression(value), ColumnBridge.expression(ordering),
        reverse = true).toAggregateExpression())
}
