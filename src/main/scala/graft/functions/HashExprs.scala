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

/** Distinct 64-bit hashes of the word n-gram shingles of a text column →
  * array<long>. One tight codegen'd pass replacing a 4-deep higher-order-
  * function chain (lower → regexp_extract_all → transform(slice/concat) →
  * transform(hash) → array_distinct) whose lambdas are CodegenFallback —
  * interpreted eval there costs ~2 ms/doc and dominated the MinHash op.
  * Tokenization matches TextOps.tokens exactly (lowercase, `\w+` runs), and
  * a shorter-than-n document yields one whole-text shingle, matching
  * TextOps.shingles — so Jaccard over these hash sets equals shingle-set
  * Jaccard up to 64-bit collisions.
  */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    WordShingleHashes.ofText(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingleHashes.ofText($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {
  private val word = java.util.regex.Pattern.compile("\\w+")

  /** Static helper shared by interpreted eval and generated code. */
  def ofText(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val m = word.matcher(s)
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    while (m.find()) tokens += m.group()
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](tokens.length)
    if (tokens.length < n) {
      // TextOps.shingles fallback: one whole-text shingle
      out += Fnv64.hashBytes(tokens.mkString(" ")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= tokens.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        val h = Fnv64.hashBytes(sb.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (seen.add(h)) out += h
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
}

/** MinHash signature over pre-hashed shingles: slot j = min_i mix(h_i, j),
  * all k slots in ONE codegen'd pass over the array (the equivalent
  * k × transform(array_min) higher-order chain is interpreted and
  * re-evaluates the input array k times). mix = Murmur3 fmix64 of
  * h ⊕ j·φ — full avalanche, so slots are independent hash families.
  */
case class MinHashSlots(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def prettyName: String = "minhash_slots"

  override def nullSafeEval(input: Any): Any =
    MinHashSlots.ofHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSlots.ofHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSlots =
    copy(child = newChild)
}

object MinHashSlots {
  final val Phi = 0x9E3779B97F4A7C15L

  def mix(h: Long, j: Int): Long = {
    var x = h ^ (j * Phi)
    x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL
    x ^= (x >>> 33); x *= 0xC4CEB9FE1A85EC53L
    x ^= (x >>> 33)
    x
  }

  def ofHashes(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = mix(h, j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }
}

/** Column-API + SQL exposure of the custom expressions. */
object GraftFunctions {
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  def rolling_hash64(tokens: Column): Column =
    ColumnBridge.column(RollingHash64(ColumnBridge.expression(tokens)))
  def word_shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingleHashes(ColumnBridge.expression(text), n))
  def minhash_slots(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSlots(ColumnBridge.expression(hashes), k))
  def proximity_match(text: Column, terms: Seq[String], span: Int): Column =
    ColumnBridge.column(ProximityMatch(ColumnBridge.expression(text), terms, span))
  def terms_match(text: Column, terms: Seq[String], minHits: Int): Column =
    ColumnBridge.column(TermsMatch(ColumnBridge.expression(text), terms, minHits))
  def phrase_match(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(PhraseMatch(ColumnBridge.expression(text), terms))
  def text_profile(text: Column): Column =
    ColumnBridge.column(TextProfile(ColumnBridge.expression(text)))

  /** Register simhash64 / rolling_hash64 for spark.sql(...) use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")
  }
}
