package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-statistics kernel behind the TextAnalysis primitives.
  *
  * Why: the curation scorers evaluate `split(trim(text), "\\s+")` plus
  * interpreted `filter` HOFs (CodegenFallback, and their lambda trees
  * escape subexpression elimination — the r9 disease) 4–6 times per
  * row: langID marker hits × 3, stopword ratio, token count, plus a
  * regexp_replace pass for the punctuation ratio. This kernel computes
  * ALL the integer inputs in one byte scan and returns a struct; the
  * double arithmetic stays in Catalyst EXACTLY as composed before, so
  * scores are bit-identical (the kernel only replaces integer counts
  * with equal integer counts — TextStatsKernelSpec property-checks
  * each field against its composed form). A projection referencing
  * several fields evaluates the kernel once: `graft_textstats(text)`
  * is a plain deterministic expression, so whole-stage codegen's
  * subexpression elimination shares it (unlike HOF lambdas).
  *
  * Field semantics (all longs, matching the composed forms):
  *  - n_tokens     = size(split(trim(text), "\\s+")) — trim strips
  *                   0x20 only; Pattern.split(s, -1) keeps one leading
  *                   and one trailing empty token around separator
  *                   runs; "" → [""] → 1.
  *  - sum_tok_len  = Σ length(token) in CODE POINTS (the aggregate
  *                   fold in meanTokenLength).
  *  - punct_chars  = length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
  *                   — code points of the ORIGINAL (untrimmed) text
  *                   outside the ASCII keep-class; every non-ASCII
  *                   code point counts 1 (counted at UTF-8 lead bytes).
  *  - n_chars      = length(text) in code points.
  *  - stop_en8     = tokens ∈ {the,a,of,and,to,in,is,it} (stopwordsEn).
  *  - mark_en/es/de = tokens ∈ the langIdHeuristic 4-marker lists.
  *  - max_tok_len  = array_max(transform(tokens, w => length(w))) in
  *                   code points (0 only for the [""]-token case).
  *  - n_digits     = length(regexp_replace(text, "[^0-9]", "")) —
  *                   ASCII digit count over the ORIGINAL text.
  *  - has_the      = array_contains(tokens, "the") as 0/1 (the C4
  *                   stopword rule).
  */
object TextStatsKernels {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  @inline private def isKeep(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || isWs(b)

  private val STOP_EN8: Array[Array[Byte]] =
    Array("the", "a", "of", "and", "to", "in", "is", "it").map(_.getBytes("UTF-8"))
  private val MARK_EN: Array[Array[Byte]] =
    Array("the", "a", "of", "and").map(_.getBytes("UTF-8"))
  private val MARK_ES: Array[Array[Byte]] =
    Array("el", "la", "de", "que").map(_.getBytes("UTF-8"))
  private val MARK_DE: Array[Array[Byte]] =
    Array("der", "die", "das", "und").map(_.getBytes("UTF-8"))
  private val THE: Array[Byte] = "the".getBytes("UTF-8")

  @inline private def matches(b: Array[Byte], s: Int, e: Int, w: Array[Byte]): Boolean = {
    if (e - s != w.length) return false
    var i = 0
    while (i < w.length) { if (b(s + i) != w(i)) return false; i += 1 }
    true
  }

  @inline private def hits(b: Array[Byte], s: Int, e: Int, ws: Array[Array[Byte]]): Boolean = {
    var i = 0
    while (i < ws.length) { if (matches(b, s, e, ws(i))) return true; i += 1 }
    false
  }

  def textStats(text: UTF8String): InternalRow = {
    val b = text.getBytes
    // pass 1: code points + punct over the ORIGINAL bytes
    var nChars = 0L
    var punct = 0L
    var nDigits = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c & 0xC0) != 0x80) { // a lead byte (or ASCII) = one code point
        nChars += 1
        if (c < 0 || !isKeep(c)) punct += 1 // non-ASCII lead OR ASCII outside keep-class
        if (c >= '0' && c <= '9') nDigits += 1
      }
      i += 1
    }
    // pass 2: tokens over the space-trimmed range
    var lo = 0
    var hi = b.length
    while (lo < hi && b(lo) == ' ') lo += 1
    while (hi > lo && b(hi - 1) == ' ') hi -= 1
    var nTokens = 0L
    var sumTokLen = 0L
    var maxTokLen = 0L
    var stopEn8 = 0L
    var markEn = 0L
    var markEs = 0L
    var markDe = 0L
    var hasThe = 0L
    def token(s: Int, e: Int): Unit = {
      nTokens += 1
      var cp = 0L
      var k = s
      while (k < e) { if ((b(k) & 0xC0) != 0x80) cp += 1; k += 1 }
      sumTokLen += cp
      if (cp > maxTokLen) maxTokLen = cp
      if (e > s) {
        if (hits(b, s, e, STOP_EN8)) stopEn8 += 1
        if (hits(b, s, e, MARK_EN)) markEn += 1
        if (hits(b, s, e, MARK_ES)) markEs += 1
        if (hits(b, s, e, MARK_DE)) markDe += 1
        if (matches(b, s, e, THE)) hasThe = 1L
      }
    }
    var pos = lo
    i = lo
    while (i < hi) {
      if (isWs(b(i))) {
        token(pos, i)
        i += 1
        while (i < hi && isWs(b(i))) i += 1
        pos = i
      } else i += 1
    }
    token(pos, hi)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, sumTokLen, punct, nChars, stopEn8, markEn, markEs, markDe,
        maxTokLen, nDigits, hasThe))
  }

  /** Lexicographic min of md5 hex digests over an array of strings —
    * equal to `array_min(transform(arr, s => md5(s)))` because
    * lowercase-hex encoding is order-isomorphic to unsigned byte-wise
    * digest comparison. Null elements are skipped (array_min ignores
    * nulls); null if the array is empty or all-null.
    */
  def md5Min(arr: ArrayData): UTF8String = {
    val md = md5Local.get()
    var best: Array[Byte] = null
    var s = 0
    val n = arr.numElements()
    while (s < n) {
      if (!arr.isNullAt(s)) {
        md.reset()
        md.update(arr.getUTF8String(s).getBytes)
        val dig = md.digest()
        if (best == null || unsignedLess(dig, best)) best = dig
      }
      s += 1
    }
    if (best == null) null else UTF8String.fromString(hex(best))
  }

  @inline private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val digits = "0123456789abcdef"
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = digits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = digits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** `graft_textstats(text)` — see [[TextStatsKernels.textStats]]. */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "graft_textstats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernels.textStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernels.textStats($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("punct_chars", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("stop_en8", LongType, nullable = false),
    StructField("mark_en", LongType, nullable = false),
    StructField("mark_es", LongType, nullable = false),
    StructField("mark_de", LongType, nullable = false),
    StructField("max_tok_len", LongType, nullable = false),
    StructField("n_digits", LongType, nullable = false),
    StructField("has_the", LongType, nullable = false)))
}

/** `graft_md5min(arr)` — see [[TextStatsKernels.md5Min]]. */
case class Md5Min(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  // null on empty/all-null arrays even when the child is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_md5min"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernels.md5Min(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextStatsKernels.md5Min($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Min =
    copy(child = newChild)
}
