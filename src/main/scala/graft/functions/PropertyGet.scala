package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_property_get(props_json, key)` — extract a top-level value
  * from a flat JSON properties object as a string
  * (reference: rust/datafusion-extensions/src/properties/property_get.rs).
  *
  * Spark's `get_json_object` is a CodegenFallback (it breaks the
  * whole-stage-codegen pipeline and re-parses with a full JSON parser
  * per row). Properties in telemetry are overwhelmingly flat
  * `{"key": value}` objects on the hot path, so this expression does a
  * single linear scan via a static helper and stays inside codegen.
  * Returns null when the key is absent. Nested objects/arrays as
  * values are out of scope (falls back to null) — use the jsonb path
  * functions for those.
  */
case class GraftPropertyGet(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_property_get"

  override protected def nullSafeEval(json: Any, key: Any): Any =
    GraftPropertyGet.extract(json.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (json, key) => {
      s"""
        ${ev.value} = graft.functions.GraftPropertyGet.extract($json, $key);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GraftPropertyGet =
    copy(left = newLeft, right = newRight)
}

object GraftPropertyGet {

  /** Single-pass tokenizer over a flat JSON object: walks key/value
    * pairs tracking string and escape state (so key-shaped text inside
    * a string VALUE can never match), decodes standard JSON escapes
    * (\n \t \r \b \f \" \\ \/ \uXXXX), and compares keys
    * ASCII-case-insensitively like the reference's
    * eq_ignore_ascii_case (property_get.rs). Returns null when the key
    * is absent, the value is a nested object/array (out of scope — use
    * the jsonb path functions), or the input isn't a JSON object.
    * Shared by interpreted eval and generated code.
    */
  def extract(json: UTF8String, key: UTF8String): UTF8String = {
    if (json == null || key == null) return null
    val s = json.toString
    val k = key.toString
    val n = s.length
    var i = skipWs(s, 0)
    if (i >= n || s.charAt(i) != '{') return null
    i = skipWs(s, i + 1)
    if (i < n && s.charAt(i) == '}') return null
    val kb = new java.lang.StringBuilder
    while (i < n) {
      if (s.charAt(i) != '"') return null
      kb.setLength(0)
      i = parseString(s, i, kb)
      if (i < 0) return null
      val hit = asciiEqualsIgnoreCase(kb, k)
      i = skipWs(s, i)
      if (i >= n || s.charAt(i) != ':') return null
      i = skipWs(s, i + 1)
      if (i >= n) return null
      s.charAt(i) match {
        case '"' =>
          val vb = new java.lang.StringBuilder
          i = parseString(s, i, vb)
          if (i < 0) return null
          if (hit) return UTF8String.fromString(vb.toString)
        case '{' | '[' =>
          i = skipNested(s, i)
          if (i < 0 || hit) return null
        case _ => // number / true / false / null literal
          var j = i
          while (j < n && s.charAt(j) != ',' && s.charAt(j) != '}') j += 1
          if (hit) return UTF8String.fromString(s.substring(i, j).trim)
          i = j
      }
      i = skipWs(s, i)
      if (i >= n || s.charAt(i) != ',') return null
      i = skipWs(s, i + 1)
    }
    null
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    i
  }

  /** Parse the string literal starting at `start` (a '"'), appending the
    * decoded value to `out`; returns the index after the closing quote,
    * or -1 if unterminated.
    */
  private def parseString(s: String, start: Int, out: java.lang.StringBuilder): Int = {
    val n = s.length
    var j = start + 1
    while (j < n) {
      val c = s.charAt(j)
      if (c == '"') return j + 1
      if (c == '\\' && j + 1 < n) {
        s.charAt(j + 1) match {
          case 'n' => out.append('\n'); j += 2
          case 't' => out.append('\t'); j += 2
          case 'r' => out.append('\r'); j += 2
          case 'b' => out.append('\b'); j += 2
          case 'f' => out.append('\f'); j += 2
          case 'u' if j + 5 < n && isHex4(s, j + 2) =>
            out.append(Integer.parseInt(s.substring(j + 2, j + 6), 16).toChar)
            j += 6
          case e => out.append(e); j += 2 // \" \\ \/ and lenient fallthrough
        }
      } else { out.append(c); j += 1 }
    }
    -1
  }

  private def isHex4(s: String, at: Int): Boolean = {
    var i = at
    while (i < at + 4) {
      if (Character.digit(s.charAt(i), 16) < 0) return false
      i += 1
    }
    true
  }

  /** Skip a balanced {...} or [...] (string- and escape-aware); returns
    * the index after it, or -1 if unbalanced.
    */
  private def skipNested(s: String, start: Int): Int = {
    val n = s.length
    var depth = 0
    var inStr = false
    var j = start
    while (j < n) {
      val c = s.charAt(j)
      if (inStr) {
        if (c == '\\') j += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0) return j + 1
        case _ =>
      }
      j += 1
    }
    -1
  }

  private def asciiEqualsIgnoreCase(a: java.lang.StringBuilder, b: String): Boolean = {
    if (a.length != b.length) return false
    var i = 0
    while (i < a.length) {
      val x = lowerAscii(a.charAt(i))
      val y = lowerAscii(b.charAt(i))
      if (x != y) return false
      i += 1
    }
    true
  }

  private def lowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
}
