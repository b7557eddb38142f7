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
  *  - null in → null out: null array or any null ELEMENT → null; a length
  *    MISMATCH yields null via the padded dot's null fold UNLESS either
  *    side has zero norm — the old `when(d === 0, 0.0)` fired before the
  *    null dot was consulted, so that case stays 0.0 (norms are self-dots
  *    and never mismatch).
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

/** Codegen'd sign-LSH bucket id (r6, guide §4): one pass over the vector
  * computes all `planes` projections — the previous per-plane
  * `aggregate(zip_with(vec, sequence(...), ...))` chain was CodegenFallback
  * (interpreted lambda folds), paid once per CORPUS ROW per plane, i.e. the
  * scan cost of every LSH op at 100 TB.
  *
  * Bit-exact equivalence with Similarity.lshBucket's formulation:
  *  - component(p, i) = (pmod(xxhash64(p:int, i:int), 20001) − 10000) /
  *    10000.0 — replayed via the same XXH64.hashInt chain Spark's xxhash64
  *    evaluates (seed 42, then each arg in order), same pmod and the same
  *    subtract-cast-divide order;
  *  - proj_p = Σ_i double(x_i) · component(p, i), sequential add in index
  *    order ≡ the per-plane zip_with+aggregate fold;
  *  - bit p set iff proj_p >= 0; any NULL element ⇒ every proj null ⇒
  *    every `when` falls to 0 ⇒ bucket 0; EMPTY vector ⇒ bucket 0 too
  *    (sequence(0, size−1) DESCENDS to [0,−1] at size 0, zip_with pads the
  *    empty side with null ⇒ null fold — replicated exactly); null vector
  *    ⇒ null.
  */
case class SignLshBucket(child: Expression, planes: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes >= 1 && planes <= 63, "need 1 <= planes <= 63")

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    SignLshBucket.bucket(input.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignLshBucket.bucket($c, $planes, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}

object SignLshBucket {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** component(p, i) of Similarity.planeComponent, bit-for-bit. */
  @inline private def component(p: Int, i: Int): Double = {
    val h = XXH64.hashInt(i, XXH64.hashInt(p, 42L))
    var r = h % 20001L
    if (r < 0) r += 20001L
    (r - 10000L).toDouble / 10000.0
  }

  def bucket(vec: ArrayData, planes: Int, isFloat: Boolean): Long = {
    val n = vec.numElements()
    if (n == 0) return 0L // descending sequence + zip_with pad ⇒ null fold
    val proj = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return 0L // null element ⇒ null projs ⇒ all bits 0
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      var p = 0
      while (p < planes) {
        proj(p) += x * component(p, i)
        p += 1
      }
      i += 1
    }
    var b = 0L
    var p = 0
    while (p < planes) {
      if (proj(p) >= 0) b |= 1L << p
      p += 1
    }
    b
  }

  def sign_lsh_bucket(vec: Column, planes: Int): Column =
    ColumnBridge.column(SignLshBucket(ColumnBridge.expression(vec), planes))
}

object CosineSim {

  /** Shared by interpreted eval and generated code. Boxed Double or null. */
  def cosine(a: ArrayData, b: ArrayData,
             aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    // Length mismatch: the old formulation computed d = norm(a)*norm(b)
    // FIRST (self-dots never mismatch) and returned 0.0 when d == 0 before
    // ever consulting the null dot — so a zero-norm side forces 0.0 even
    // for ragged inputs; otherwise the padded dot's null fold wins (null).
    // A null ELEMENT nulls its norm → d null → `when(null === 0)` is not
    // matched → null. (Review r6 finding; edge pinned in ExprSpec.)
    if (b.numElements() != n) {
      val na = normSq(a, aFloat)
      val nb = normSq(b, bFloat)
      if (na == null || nb == null) return null
      val d = math.sqrt(na) * math.sqrt(nb)
      return if (d == 0) 0.0 else null
    }
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

  /** Σ x², sequential; null if any element is null (≡ the HOF self-dot). */
  private def normSq(v: ArrayData, isFloat: Boolean): java.lang.Double = {
    var s = 0.0
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      s += x * x
      i += 1
    }
    s
  }

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
