package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text classification profile: every count the language-ID +
  * quality-score stage needs, from ONE expression evaluation instead of ~10
  * regex passes over the same string.
  *
  * Why this exists: `TextAnalysis.qualityScore` + `withLangId` (the curation
  * funnel's row-filter stage, q26/q27/q61/q62) were expressed as a pile of
  * `regexp_count` / `regexp_extract_all` calls — 4 stopword alternations, 3
  * character-class extractions, and a `regexp_replace`, each a full
  * java.util.regex scan of the document. All of those counts are functions of
  * byte-class runs, so this expression computes the whole profile in two raw
  * byte scans (original + lowercased), no regex engine, no match-array
  * allocation — same shape as `GrokMatch` (one reference object, a single
  * static call in generated code, codegen-stable).
  *
  * Exact-equivalence contract with the regex formulation (property-tested in
  * OpsSpec against the old expressions, and pinned end-to-end by the
  * q26/q27/q61/q62 DuckDB oracles):
  *  - n_tokens = size(regexp_extract_all(t, "\\S+"))
  *      = maximal runs of non-whitespace; \s is the ASCII Java set
  *      [ \t\n\x0B\f\r], so every non-ASCII byte extends a token.
  *  - n_words  = size(regexp_extract_all(lower(t), "[a-z]+"))
  *      = maximal a-z runs of the LOWERCASED string (UTF8String.toLowerCase,
  *      the exact function Spark's `lower` evaluates).
  *  - n_punct  = size(regexp_extract_all(t, "[^\\w\\s]"))
  *      = code points that are neither ASCII word chars [A-Za-z0-9_] nor
  *      ASCII whitespace. One count per code point — in UTF-8 that is one
  *      count per non-continuation byte that fails both classes, and every
  *      non-ASCII code point counts (both java.util.regex and RE2 define
  *      \w/\s as ASCII-only without flags).
  *  - n_alpha  = length(regexp_replace(lower(t), "[^a-z]", ""))
  *      = total a-z bytes of the lowercased string (mean-word-length input).
  *  - bpeish_tokens = size(regexp_extract_all(t, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))
  *      (r6, for q28/token accounting) = maximal ASCII-letter runs of the
  *      ORIGINAL string, plus one per ASCII digit, plus one per code point
  *      outside [A-Za-z0-9\s] ('_' and every non-ASCII code point
  *      included). Alternation order can't merge classes: a letter run
  *      never contains a digit, so the three alternatives partition the
  *      non-whitespace code points exactly as the per-class counts do.
  *  - sw_XX    = regexp_count(lower(t), "\\b(w1|...|wN)\\b")
  *      = lowercased maximal ASCII word-char runs [a-z0-9_] that EXACTLY
  *      equal a stopword. Equivalence argument: every alternative is a pure
  *      a-z word wrapped in \b, so a match can only start at a word boundary
  *      and must end at one — i.e. the match must cover a full maximal
  *      word-char run; runs longer than the word, or containing digits or
  *      '_', cannot match, and disjoint runs can never overlap, so the
  *      non-overlapping find() count is exactly the number of runs in the
  *      set. (Any residual A-Z after toLowerCase still acts as a word char.)
  *
  * Null in → null struct out (the regex pile null-propagates identically).
  */
case class TextProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextProfile.schema
  override def prettyName: String = "text_profile"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextProfile.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextProfile.profile($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
}

object TextProfile {

  /** Languages in argmax tie-break order (mirrors
    * TextAnalysis.stopwordPatterns).
    */
  val languages: Seq[String] = Seq("en", "fr", "de", "es")

  val schema: StructType = StructType(
    (Seq("n_tokens", "n_words", "n_punct", "n_alpha") ++
      languages.map("sw_" + _) :+ "bpeish_tokens")
      .map(f => StructField(f, IntegerType, nullable = false)))

  /** Stopword lists (≤ 4 chars each, pure a-z — packing below relies on
    * both). A word may belong to several languages ("de", "la", "un", "une",
    * "que"), hence the bitmask table.
    */
  private val stopwords: Seq[Seq[String]] = Seq(
    Seq("the", "and", "is", "of", "to", "in", "that", "it", "for", "was"),
    Seq("le", "la", "les", "et", "est", "de", "un", "une", "que", "pour"),
    Seq("der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"),
    Seq("el", "la", "los", "las", "es", "de", "un", "una", "que", "por"))

  /** A ≤4-byte a-z word packed little-endian into a long (length implicit:
    * unused high bytes stay 0 and 'a' ≥ 0x61 > 0, so distinct words get
    * distinct keys).
    */
  private def pack(w: String): Long =
    w.getBytes("US-ASCII").zipWithIndex
      .map { case (b, i) => (b & 0xffL) << (8 * i) }.sum

  // parallel sorted arrays for allocation-free binary search in the hot loop
  private val (swKeys: Array[Long], swMasks: Array[Int]) = {
    val m = scala.collection.mutable.Map.empty[Long, Int]
    stopwords.zipWithIndex.foreach { case (ws, lang) =>
      ws.foreach { w =>
        require(w.length <= 4 && w.forall(c => c >= 'a' && c <= 'z'), w)
        val k = pack(w)
        m(k) = m.getOrElse(k, 0) | (1 << lang)
      }
    }
    val sorted = m.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** Shared by interpreted eval and generated code. */
  def profile(text: UTF8String): InternalRow = {
    // pass 1 — original bytes: \S+ token runs and [^\w\s] code points
    val ob = text.getBytes
    var nTokens = 0
    var nPunct = 0
    var nBpe = 0
    var inTok = false
    var inLetter = false
    var i = 0
    while (i < ob.length) {
      val b = ob(i)
      if (b >= 0 && isWs(b)) { inTok = false; inLetter = false }
      else {
        if (!inTok) nTokens += 1
        inTok = true
        // count each code point (non-continuation byte) outside \w and \s;
        // any non-ASCII code point is outside both ASCII classes
        if ((b & 0xc0) != 0x80 && !(b >= 0 && isWord(b))) nPunct += 1
        // bpeish pre-tokenizer classes: [A-Za-z]+ run | [0-9] | one per
        // other code point (see scaladoc equivalence entry)
        val letter = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
        if (letter) { if (!inLetter) nBpe += 1; inLetter = true }
        else {
          inLetter = false
          if (b >= '0' && b <= '9') nBpe += 1
          else if ((b & 0xc0) != 0x80) nBpe += 1
        }
      }
      i += 1
    }
    // pass 2 — lowercased bytes: [a-z]+ runs, a-z total, stopword-run hits
    val lb = text.toLowerCase.getBytes
    var nWords = 0
    var nAlpha = 0
    var inAz = false
    var runLen = 0 // current maximal word-char run
    var runKey = 0L // its packed bytes while still pure a-z and ≤ 4 long
    var runPure = true
    val sw = new Array[Int](languages.length)
    def endRun(): Unit = {
      if (runLen > 0 && runLen <= 4 && runPure) {
        val idx = java.util.Arrays.binarySearch(swKeys, runKey)
        if (idx >= 0) {
          val mask = swMasks(idx)
          var l = 0
          while (l < sw.length) {
            if ((mask & (1 << l)) != 0) sw(l) += 1
            l += 1
          }
        }
      }
      runLen = 0; runKey = 0L; runPure = true
    }
    i = 0
    while (i < lb.length) {
      val b = lb(i)
      val az = b >= 'a' && b <= 'z'
      if (az) {
        nAlpha += 1
        if (!inAz) nWords += 1
        inAz = true
      } else inAz = false
      if (b >= 0 && isWord(b)) {
        if (az) { if (runLen < 4) runKey |= (b & 0xffL) << (8 * runLen) }
        else runPure = false
        runLen += 1
        if (runLen > 4) runKey = -1L // can no longer match any ≤4-byte word
      } else endRun()
      i += 1
    }
    endRun()
    val out = new Array[Any](5 + sw.length)
    out(0) = nTokens; out(1) = nWords; out(2) = nPunct; out(3) = nAlpha
    var l = 0
    while (l < sw.length) { out(4 + l) = sw(l); l += 1 }
    out(4 + sw.length) = nBpe
    new GenericInternalRow(out)
  }
}
