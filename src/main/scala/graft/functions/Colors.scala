package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Color UDFs for heat-map style rendering, as pure codegen'd column
  * arithmetic (reference: rust/datafusion-extensions/src/color/).
  * Packed colors are 0xRRGGBBAA in a BIGINT (the reference's UInt32
  * doesn't fit a signed int).
  */
object Colors {

  /** Quantize a [0,1] float to 0..255 half-up with clamping
    * (reference mod.rs float_to_byte: (f*255+0.5).clamp(0,255) as u8).
    */
  private def floatToByte(f: Column): Column =
    floor(least(greatest(f * lit(255.0) + lit(0.5), lit(0.0)), lit(255.0))).cast("long")

  private def roundToByte(f: Column): Column =
    floor(least(greatest(f + lit(0.5), lit(0.0)), lit(255.0))).cast("long")

  def rgba(r: Column, g: Column, b: Column, a: Column): Column =
    floatToByte(r) * lit(16777216L) + floatToByte(g) * lit(65536L) +
      floatToByte(b) * lit(256L) + floatToByte(a)

  private def channel(c: Column, shift: Int): Column =
    pmod(floor(c / lit(math.pow(2, shift).toLong)).cast("long"), lit(256L))

  /** Component-wise lerp between two packed colors (lerp_color.rs). */
  def lerpColor(c1: Column, c2: Column, t: Column): Column = {
    def lerpCh(shift: Int): Column = {
      val a = channel(c1, shift).cast("double")
      val b = channel(c2, shift).cast("double")
      roundToByte(a + (b - a) * t)
    }
    lerpCh(24) * lit(16777216L) + lerpCh(16) * lit(65536L) + lerpCh(8) * lit(256L) + lerpCh(0)
  }

  /** Viridis control points every t=1/8 (standard matplotlib samples). */
  private val viridis: Seq[(Int, Int, Int)] = Seq(
    (68, 1, 84), (72, 40, 120), (62, 74, 137), (49, 104, 142), (38, 130, 142),
    (31, 158, 137), (53, 183, 121), (109, 205, 89), (253, 231, 37))

  /** Sample the viridis scale at t in [0,1] with the given alpha
    * (color_scale.rs shape; piecewise-linear between control points).
    */
  def colorScaleViridis(t: Column, alpha: Column): Column = {
    val tc = least(greatest(t, lit(0.0)), lit(1.0))
    val seg = least(floor(tc * lit(8.0)).cast("int"), lit(7))
    val frac = tc * lit(8.0) - seg.cast("double")
    def ch(f: (Int, Int, Int) => Int): Column = {
      val lo = viridis.map(f.tupled)
      val loC = element_at(array(lo.map(lit): _*), seg + 1).cast("double")
      val hiC = element_at(array(lo.map(lit): _*), seg + 2).cast("double")
      roundToByte(loC + (hiC - loC) * frac)
    }
    ch((r, _, _) => r) * lit(16777216L) + ch((_, g, _) => g) * lit(65536L) +
      ch((_, _, b) => b) * lit(256L) + floatToByte(alpha)
  }
}
