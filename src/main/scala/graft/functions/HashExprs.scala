package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit FNV-1a over UTF-8 bytes — the shared token hash for
  * the sketch expressions below. Chosen over JVM `hashCode` for cross-run /
  * cross-JVM determinism (routed-row equality must survive retries).
  */
object Fnv64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= Prime; i += 1 }
    h
  }
  def hashUtf8(s: UTF8String): Long = hashBytes(s.getBytes)
}

/** SimHash over an array<string> of tokens → 64-bit signature (LongType).
  *
  * Charikar's similarity hash: each token votes ±1 on each of 64 bit
  * positions (by its FNV-1a hash bit); the signature takes the sign of each
  * accumulated vote. Near-duplicate documents differ in few bits, so
  * `bit_count(a ^ b) <= k` finds near-dups without pairwise text compares.
  *
  * A custom Catalyst Expression (not a Scala UDF): operates on UTF8String /
  * ArrayData directly — zero row-object conversion — and generates inline
  * Java via doGenCode so it stays inside WholeStageCodegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    java.lang.Long.valueOf(SimHash64.ofArray(arr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.ofArray($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static helper shared by interpreted eval and generated code. */
  def ofArray(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Fnv64.hashUtf8(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** Polynomial rolling hash over an array<string> of tokens → 64-bit
  * fingerprint (LongType): h = Σ token_hash · P^pos. Order-sensitive (unlike
  * SimHash), so it fingerprints the document *sequence* — alco's exact-dup
  * analog for content-defined identity.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(RollingHash64.ofArray(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash64.ofArray($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  final val P = 1099511628211L
  def ofArray(arr: ArrayData): Long = {
    var h = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) 0L else Fnv64.hashUtf8(arr.getUTF8String(i))
      h = h * P + t
      i += 1
    }
    h
  }
}

/** Column-API + SQL exposure of the custom expressions. */
object GraftFunctions {
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  def rolling_hash64(tokens: Column): Column =
    ColumnBridge.column(RollingHash64(ColumnBridge.expression(tokens)))

  /** Register simhash64 / rolling_hash64 for spark.sql(...) use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")
  }
}
