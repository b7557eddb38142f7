package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd cosine similarity over two numeric arrays (r6, guide §4:
  * eliminate non-codegen expressions in the hot path).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function chain in
  * `Similarity.cosine` — HigherOrderFunctions are CodegenFallback, so every
  * scored PAIR paid three interpreted lambda folds plus a zip_with array
  * allocation each (dot, norm(a), norm(b)); on the similarity ops the
  * pairwise scoring is THE inner loop (q24/q25/q38/q42/q60/q76/q77/q79).
  *
  * Bit-exact equivalence with the replaced formulation (pair-oracled by
  * q77/q79 and the brute-force bridges):
  *  - one pass accumulates ab/aa/bb; each accumulator's IEEE operation
  *    sequence (cast-to-double, multiply, sequential add in index order) is
  *    exactly its zip_with+aggregate's;
  *  - result = ab / (sqrt(aa) * sqrt(bb)), with `d == 0 → 0.0` (NaN d
  *    falls through to ab/d, as `when(d === 0)` did);
  *  - null in → null out: null array, length mismatch (zip_with pads with
  *    null → null product → null fold) or any null ELEMENT → null.
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  @transient private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = graft.functions.CosineSim.cosine($a, $b, $leftFloat, $rightFloat);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) r).doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Shared by interpreted eval and generated code. Boxed Double or null. */
  def cosine(a: ArrayData, b: ArrayData,
             aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with pads with null → null fold
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null // null element → null fold
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    val d = math.sqrt(aa) * math.sqrt(bb)
    if (d == 0) 0.0 else ab / d
  }

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
