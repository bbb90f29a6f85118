package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col => _, round => sparkRound, _}

package object queries {
  /** Epoch milliseconds of a (possibly ntz) timestamp column. Session
    * timezone is UTC everywhere, so ntz→ltz cast is the identity
    * instant and matches DuckDB's `epoch_ms` on the same parquet.
    */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** DuckDB-compatible rounding. Deliberately SHADOWS
    * `functions.round(Column, Int)` inside the `graft.queries` package:
    * Spark's builtin rounds the decimal expansion of the double
    * (BigDecimal HALF_UP) while DuckDB computes
    * `std::round(x * 10^k) / 10^k` in doubles — near .xxx5 boundaries
    * the two disagree, which breaks exact hash comparison against the
    * oracle. Reproducing DuckDB's arithmetic keeps rounded outputs
    * bit-identical.
    */
  def round(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    val x = c * lit(p)
    val r = when(x >= 0, floor(x + lit(0.5))).otherwise(-floor(-x + lit(0.5)))
    when(c.isNull, lit(null)).otherwise(r.cast("double") / lit(p))
  }
}
