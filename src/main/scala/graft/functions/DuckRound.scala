package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `graft_round(x, k)` — DuckDB-exact double rounding:
  * `std::round(x * 10^k) / 10^k` computed entirely in doubles.
  *
  * Spark's builtin `round` rounds the decimal expansion (BigDecimal
  * HALF_UP) and disagrees with DuckDB near .xxx5 boundaries; a
  * column-algebra emulation via `floor` silently routes through BIGINT
  * (Spark's floor returns LongType), which destroys the sign of zero —
  * DuckDB emits -0.0 for tiny negatives where the emulation emitted
  * +0.0, breaking byte-exact oracle hashes. This expression reproduces
  * C++ `std::round` semantics exactly: round half away from zero,
  * sign-of-zero preserved via copySign, values >= 2^52 returned as-is
  * (already integral).
  *
  * Reference analog: DuckDB round(DOUBLE, k); semantics of the
  * reference engine's DataFusion round differ, but the oracle is DuckDB.
  */
// Inputs are coerced by the registration builder (Cast to double/int);
// ExpectsInputTypes is unavailable outside Spark's sql package.
case class DuckRound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_round"

  override protected def nullSafeEval(x: Any, k: Any): Any =
    DuckRound.round(x.asInstanceOf[Double], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, k) => {
      val p = ctx.freshName("p")
      val v = ctx.freshName("v")
      val m = ctx.freshName("m")
      val r = ctx.freshName("r")
      // floor + exact-fraction compare, NOT floor(m + 0.5): the addition
      // can round up across an integer (m = 0.49999999999999994 gives
      // m + 0.5 -> 1.0) and diverge from std::round. m - floor(m) is
      // exact (Sterbenz), so the comparison is exact for all finite m;
      // NaN falls through (NaN >= .5 is false) and copySign propagates.
      s"""
        double $p = java.lang.Math.pow(10.0, $k);
        double $v = $x * $p;
        double $m = java.lang.Math.abs($v);
        double $r = java.lang.Math.floor($m);
        if ($m - $r >= 0.5) $r += 1.0;
        ${ev.value} = java.lang.Math.copySign($r, $v) / $p;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DuckRound =
    copy(left = newLeft, right = newRight)
}

object DuckRound {
  /** Round half away from zero, sign-of-zero preserving (C++ std::round).
    * floor + exact-fraction compare — see the codegen comment for why
    * floor(m + 0.5) would be wrong.
    */
  def round(x: Double, scale: Int): Double = {
    val p = math.pow(10.0, scale)
    val v = x * p
    val m = math.abs(v)
    var r = math.floor(m)
    if (m - r >= 0.5) r += 1.0
    java.lang.Math.copySign(r, v) / p
  }
}
