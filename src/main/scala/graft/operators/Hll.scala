package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-exact HyperLogLog building blocks (m = 16 registers).
  *
  * The register derivation is pure hex-string arithmetic over
  * md5(id) — standardized, so a DuckDB oracle replays it byte-for-byte
  * (see q_hll_sketch) — and the harmonic-mean denominator is the
  * SCALED-INTEGER sum of the dyadic terms 2^(49-M_j), so aggregation
  * order can never perturb the FP estimate. Registers are mergeable by
  * MAX, which makes the sketch streaming-friendly: a windowed groupBy
  * max(rho) is an incrementally-maintained HLL (used by the streaming
  * spec), exactly like the reference's mergeable histogram sketches.
  *
  * No small-range linear-counting correction: its ln() is
  * implementation-defined in the last bit across engines; callers get
  * the raw estimate plus n_zero and can correct downstream if they
  * accept engine-specific results.
  */
object Hll {

  val M = 16
  /** 2^49 — the scale of the integer harmonic sum (max rho is 49). */
  val Scale: Long = 562949953421312L
  private val alpha = 0.673 // standard HLL bias constant for m=16

  /** Register index (0..15): first hex digit of md5(id). */
  def idx(id: Column): Column = conv(substring(md5(id.cast("string")), 1, 1), 16, 10).cast("int")

  /** Rank rho (1..49): leading-zero count of the next 48 bits + 1,
    * derived from hex digits alone.
    */
  def rho(id: Column): Column = {
    val r = ltrim(substring(md5(id.cast("string")), 2, 12), "0")
    val d = substring(r, 1, 1)
    val zb = when(d === "1", 3).when(d.isin("2", "3"), 2)
      .when(d.isin("4", "5", "6", "7"), 1).otherwise(0)
    when(length(r) === 0, 49).otherwise((lit(12) - length(r)) * 4 + zb + 1)
  }

  /** Registers for `id` grouped by the named key columns: one row per
    * (keys*, idx) with the max rank. Mergeable by further max over idx.
    */
  def registers(df: DataFrame, keyNames: Seq[String], id: Column): DataFrame =
    df.select((keyNames.map(col) :+ idx(id).as("idx") :+ rho(id).as("rho")): _*)
      .groupBy((keyNames.map(col) :+ col("idx")): _*)
      .agg(max("rho").as("mrho"))

  /** Fold registers (grouped by `keyNames`) to the sketch row:
    * n_reg, n_zero, hll_estimate.
    */
  def estimate(regs: DataFrame, keyNames: Seq[String]): DataFrame = {
    val den = col("isum") + (lit(M.toLong) - col("n_reg")) * lit(Scale)
    regs.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("n_reg"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - mrho AS INT))")).as("isum"))
      .select((keyNames.map(col) :+ col("n_reg") :+ (lit(M.toLong) - col("n_reg")).as("n_zero") :+
        (lit(alpha) * lit((M * M).toDouble) * lit(Scale.toDouble) / den.cast("double"))
          .as("hll_estimate")): _*)
  }
}
