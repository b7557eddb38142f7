package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Grouped rollup that rides an `observe()` on the write pass: per distinct
  * `key` it accumulates a row count plus one bounded distinct-value set per
  * slot of the `values` array — i.e. alco's per-(index, interval) Redis
  * counters AND per-column SADD caches in ONE pass over the rows being
  * written, with zero extra jobs (SURVEY.md O21/O22; the round-1 design
  * recomputed these from a post-write read-back, a ~3.5 s non-scaling tail
  * on every batch).
  *
  * Output is a JSON string `{"key":{"n":<count>,"sets":[[v,…],…]},…}` —
  * the key space is bounded (tools × roles × days) and the value sets are
  * bounded by the dimensions' value space, so the driver-side metric stays
  * O(#partitions), never O(rows), at 10^12-turn scale. Sets are sorted at
  * serialization for deterministic output.
  *
  * Runs inside Spark's `AggregatingAccumulator` (observe) or as a regular
  * ObjectHashAggregate if used in a groupBy.
  */
case class KeyedRollup(
    key: Expression,
    values: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KeyedRollup.Buffer] {

  override def children: Seq[Expression] = Seq(key, values)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "keyed_rollup"

  override def createAggregationBuffer(): KeyedRollup.Buffer =
    new KeyedRollup.Buffer

  // Allocation-free steady state (r6): the hot-path update used to call
  // UTF8String.toString on the key AND every distinct-slot value — ~5 Java
  // String allocations PER WRITTEN ROW, i.e. direct GC pressure on the
  // pipeline's 4-thread leg (guide §5; the bench's n4 legs showed gc_sec
  // inflation in degraded windows). Keys/values now stay UTF8String:
  // lookups compare the transient row-backed bytes directly, and a copy is
  // made only on FIRST insert of a new key/value (bounded by tools × roles
  // × days and the dimensions' value space — O(1) amortized).
  override def update(buf: KeyedRollup.Buffer, input: InternalRow): KeyedRollup.Buffer = {
    val k = key.eval(input)
    if (k != null) {
      val stats = buf.statsFor(k.asInstanceOf[UTF8String])
      stats.n += 1
      val arr = values.eval(input).asInstanceOf[ArrayData]
      if (arr != null) {
        val m = arr.numElements()
        if (stats.sets.length < m) stats.grow(m)
        var i = 0
        while (i < m) {
          if (!arr.isNullAt(i)) {
            val v = arr.getUTF8String(i)
            val set = stats.sets(i)
            if (!set.contains(v)) set += v.clone() // own the bytes: the row buffer is reused
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(b1: KeyedRollup.Buffer, b2: KeyedRollup.Buffer): KeyedRollup.Buffer = {
    b2.map.foreach { case (k, s2) =>
      val s1 = b1.statsFor(k)
      s1.n += s2.n
      if (s1.sets.length < s2.sets.length) s1.grow(s2.sets.length)
      var i = 0
      while (i < s2.sets.length) { s1.sets(i) ++= s2.sets(i); i += 1 }
    }
    b1
  }

  override def eval(buf: KeyedRollup.Buffer): Any =
    UTF8String.fromString(KeyedRollup.toJson(buf))

  override def serialize(buf: KeyedRollup.Buffer): Array[Byte] =
    KeyedRollup.toJson(buf).getBytes(StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): KeyedRollup.Buffer =
    KeyedRollup.fromJson(new String(bytes, StandardCharsets.UTF_8))

  override def withNewMutableAggBufferOffset(newOffset: Int): KeyedRollup =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KeyedRollup =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KeyedRollup =
    copy(key = newChildren(0), values = newChildren(1))
}

object KeyedRollup {

  final class Stats {
    var n: Long = 0L
    var sets: Array[mutable.HashSet[UTF8String]] = Array.empty
    def grow(m: Int): Unit = {
      val next = Array.fill(m)(mutable.HashSet.empty[UTF8String])
      System.arraycopy(sets, 0, next, 0, sets.length)
      sets = next
    }
  }

  final class Buffer {
    val map: mutable.HashMap[UTF8String, Stats] = mutable.HashMap.empty
    /** Lookup with a transient row-backed key; clones the bytes only when
      * inserting a new key (UTF8String hashes/compares by bytes).
      */
    def statsFor(k: UTF8String): Stats = map.get(k) match {
      case Some(s) => s
      case None =>
        val s = new Stats
        map.put(k.clone(), s)
        s
    }
    def statsFor(k: String): Stats = statsFor(UTF8String.fromString(k))
  }

  private val mapper = new ObjectMapper()

  // Strings materialize HERE, once per distinct key/value at serialization
  // (sorted as java.lang.String, exactly as before — the UTF8String binary
  // order could differ for non-ASCII, so the JSON stays byte-identical).
  def toJson(buf: Buffer): String = {
    val root = mapper.createObjectNode()
    buf.map.toSeq.map { case (k, s) => k.toString -> s }.sortBy(_._1)
      .foreach { case (k, s) =>
        val o = root.putObject(k)
        o.put("n", s.n)
        val sets = o.putArray("sets")
        s.sets.foreach { set =>
          val a = sets.addArray()
          set.toSeq.map(_.toString).sorted.foreach(a.add)
        }
      }
    root.toString
  }

  def fromJson(json: String): Buffer = {
    val buf = new Buffer
    if (json.isEmpty) return buf
    val root = mapper.readTree(json).asInstanceOf[ObjectNode]
    root.fields().asScala.foreach { e =>
      val s = buf.statsFor(e.getKey)
      s.n = e.getValue.get("n").asLong()
      val sets = e.getValue.get("sets")
      s.grow(sets.size())
      (0 until sets.size()).foreach { i =>
        sets.get(i).elements().asScala.foreach(v =>
          s.sets(i) += UTF8String.fromString(v.asText()))
      }
    }
    buf
  }

  /** Parsed driver-side view of one rollup key. */
  final case class Entry(key: String, n: Long, sets: Seq[Set[String]])

  def parse(json: String): Seq[Entry] = {
    val buf = fromJson(json)
    buf.map.toSeq.map { case (k, s) => k.toString -> s }.sortBy(_._1)
      .map { case (k, s) =>
        Entry(k, s.n, s.sets.toSeq.map(_.map(_.toString).toSet))
      }
  }

  def keyed_rollup(key: Column, values: Column): Column =
    ColumnBridge.column(
      KeyedRollup(ColumnBridge.expression(key), ColumnBridge.expression(values))
        .toAggregateExpression())
}
