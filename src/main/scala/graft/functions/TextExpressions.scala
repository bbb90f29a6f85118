package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared text kernels (static so generated code can call them). */
object TextKernels {

  /** Normalization-fingerprint kernel, byte-for-byte equal to
    * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""),
    * "\\s+", " "))` — the l_norm_dedup family's normalizer (and the
    * DuckDB oracle's, which keeps the regex form).
    *
    * Why a kernel: the r11 stage profile put 97% of l_norm_dedup's
    * third-decade wall in this projection — two java.util.regex passes
    * (each compiling a match loop + building an intermediate string)
    * over every corpus byte. One byte scan does the same work.
    *
    * Exactness argument: the lowercase step is the SAME call `lower()`
    * makes (UTF8String.toLowerCase, full Unicode mapping — e.g. the
    * Kelvin sign lowercases into ASCII 'k', which a naive
    * ASCII-only fold would miss). After lowercasing, the kept
    * alphabet ([a-z0-9] and Java's \s = [ \t\n\x0B\f\r]) is pure
    * ASCII, so a byte-level scan is exact on UTF-8: every byte of a
    * multi-byte code point is >= 0x80 (negative as a JVM byte) and
    * falls through to the delete branch, which is what the regex does
    * to every non-ASCII code point. Delete-before-collapse order is
    * preserved by NOT clearing the pending-space flag on deleted
    * bytes ("a . b" → "a b", exactly like the two-pass form), and
    * emitting separators only between words reproduces the final
    * trim (which strips the single leading/trailing space the
    * collapse pass would have left).
    */
  def normalizeWords(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = c
        o += 1
      } else if (c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r') {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}

/** `graft_normalize(text)` — see [[TextKernels.normalizeWords]]. */
case class NormalizeWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.normalizeWords(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.normalizeWords($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeWords =
    copy(child = newChild)
}
