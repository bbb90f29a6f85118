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

  /** Linear scan for `"key"` at the top level of a flat JSON object;
    * returns the value with quotes stripped, or null. Shared by
    * interpreted eval and generated code.
    */
  def extract(json: UTF8String, key: UTF8String): UTF8String = {
    if (json == null || key == null) return null
    val s = json.toString
    val k = "\"" + key.toString + "\""
    var from = 0
    while (true) {
      val at = s.indexOf(k, from)
      if (at < 0) return null
      var i = at + k.length
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < s.length && s.charAt(i) == ':') {
        i += 1
        while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
        if (i >= s.length) return null
        s.charAt(i) match {
          case '"' =>
            val sb = new java.lang.StringBuilder
            var j = i + 1
            while (j < s.length && s.charAt(j) != '"') {
              if (s.charAt(j) == '\\' && j + 1 < s.length) { sb.append(s.charAt(j + 1)); j += 2 }
              else { sb.append(s.charAt(j)); j += 1 }
            }
            return UTF8String.fromString(sb.toString)
          case '{' | '[' => return null // nested values: out of scope
          case _ =>
            var j = i
            while (j < s.length && s.charAt(j) != ',' && s.charAt(j) != '}') j += 1
            return UTF8String.fromString(s.substring(i, j).trim)
        }
      }
      from = at + 1 // matched text wasn't a key position; keep scanning
    }
    null
  }
}
