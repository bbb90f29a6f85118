package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (interval) join: all pairs on the same key whose times lie
  * within `widthMs` of each other — "what else happened near this
  * event", the temporal-correlation primitive.
  *
  * A direct `|lt - rt| <= w` predicate is a non-equi join: Spark plans
  * a nested-loop over the key groups (O(n·m) per key, and with no
  * equi-key at all, a broadcast cartesian). The scale shape instead
  * buckets time into width-sized bins and equi-joins on (key, bin):
  * a right row in bin b can only match left rows in bins b-1, b, b+1,
  * so the LEFT side explodes into its 3 candidate bins (3× one side,
  * never n×m), the join is a plain hash join on (key, bin), and the
  * exact |Δt| <= w filter prunes the band edges afterwards.
  */
object BandJoin {

  /** Pairs (left row, right row) with equal `key` and
    * |leftTimeMs - rightTimeMs| <= widthMs. `leftTimeMs`/`rightTimeMs`
    * are expressions over the UNPREFIXED input columns; output keeps
    * left columns prefixed `l_` and right columns prefixed `r_`.
    */
  def within(left: DataFrame, right: DataFrame, key: String,
      leftTimeMs: Column, rightTimeMs: Column, widthMs: Long): DataFrame = {
    require(widthMs > 0, "bandJoin: widthMs must be positive")
    def prefixed(df: DataFrame, t: Column, p: String): DataFrame = {
      val withT = df.withColumn("__t", t) // t sees the unprefixed names
      df.columns.foldLeft(withT)((d, c) => d.withColumnRenamed(c, s"$p$c"))
    }
    val l = prefixed(left, leftTimeMs, "l_")
      .withColumnRenamed("__t", "__lt")
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__lbin", col("__off") + floor(col("__lt") / widthMs))
      .drop("__off")
    val r = prefixed(right, rightTimeMs, "r_")
      .withColumnRenamed("__t", "__rt")
      .withColumn("__rbin", floor(col("__rt") / widthMs))
    // shuffle_hash pin: both sides are corpus-proportional (the left
    // ×3 after the adjacent-bin explode), and the post-Generate size
    // estimate undercounts enough for Catalyst to statically broadcast
    // the left at lake scale (82 MB built at sf1, BroadcastBudgetSpec)
    // — a plan AQE never demotes. The banded equi-join must stay
    // keyed; the exploded side is the per-partition build side.
    l.hint("shuffle_hash")
      .join(r, col(s"l_$key") === col(s"r_$key") && col("__lbin") === col("__rbin"))
      .where(abs(col("__lt") - col("__rt")) <= widthMs)
      .drop("__lbin", "__rbin", "__lt", "__rt")
  }
}
