package graft

import graft.functions.DuckRound

/** DuckRound vs DuckDB 1.0 ground truth (values produced by running
  * `SELECT round(CAST(x AS DOUBLE), k)` in DuckDB), compared bitwise.
  * The floor + exact-fraction form matters: floor(m + 0.5) would round
  * 0.49999999999999994 (the predecessor of 0.5) up to 1 because the
  * addition crosses 1.0; DuckDB/std::round gives 0.
  */
class DuckRoundSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
  private def assertBitEq(x: Double, k: Int, want: Double): Unit = {
    val got = DuckRound.round(x, k)
    assert(bits(got) === bits(want), s"round($x, $k): got $got want $want")
  }

  test("matches DuckDB on half-boundary and sign-of-zero cases") {
    assertBitEq(0.49999999999999994, 0, 0.0)
    assertBitEq(-0.49999999999999994, 0, -0.0)
    assertBitEq(0.5, 0, 1.0)
    assertBitEq(-0.5, 0, -1.0)
    assertBitEq(2.5, 0, 3.0)
    assertBitEq(-2.5, 0, -3.0)
    assertBitEq(1.4999999999999998, 0, 1.0)
    assertBitEq(0.285, 2, 0.28)   // 0.285*100 = 28.499999999999996 → 28
    assertBitEq(2.675, 2, 2.68)   // 2.675*100 = 267.5 (rounds up in the multiply) → 268
    assertBitEq(-0.125, 2, -0.13)
    assertBitEq(-1e-300, 2, -0.0) // tiny negative → negative zero
    assertBitEq(1e300, 2, 1e300)  // huge values already integral
    assertBitEq(-4.1756260969689035e-07, 6, -0.0)
  }

  test("NaN and infinities propagate") {
    assert(DuckRound.round(Double.NaN, 2).isNaN)
    assert(DuckRound.round(Double.PositiveInfinity, 2) === Double.PositiveInfinity)
    assert(DuckRound.round(Double.NegativeInfinity, 2) === Double.NegativeInfinity)
  }
}
