package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming seasonal-deviation alerting — the live leg of
  * m_seasonal_baseline (M90), and the streaming layer's STREAM-STATIC
  * join pattern: live windowed counts broadcast-joined against a
  * precomputed per-(name, hour-of-day) baseline table.
  *
  * Split of responsibilities mirrors a real deployment: the BASELINE
  * is a batch product (daily materialization over weeks of history —
  * cheap, exact, versioned with the lake), while the LIVE side is a
  * watermarked hourly count per name. Structured Streaming re-plans
  * the static side per micro-batch, so a re-materialized baseline is
  * picked up without restarting the query, and the join is a
  * broadcast hash join (the baseline is names × 24 rows — tiny at any
  * fleet size), never a stateful stream-stream join: no join state to
  * watermark, O(1) per-batch cost beyond the windowed count itself.
  */
object BaselineStream {

  /** Per-(name, hour-of-day) baseline from a BATCH events frame
    * (ts timestamp, name string): mean hourly count e4, exact
    * integers — total·1e4 div nDays (each hod occurs once per day).
    */
  def hodBaseline(events: DataFrame): DataFrame = {
    val nDays = events.select(
      countDistinct(date_trunc("day", col("ts"))).as("n_days"))
    events
      .groupBy(col("name"),
        (unix_millis(col("ts")) % lit(86400000L) / lit(3600000L)).cast("long").as("hod"))
      .agg(count(lit(1)).as("total"))
      .crossJoin(broadcast(nDays))
      .select(col("name"), col("hod"),
        expr("total * 10000 div n_days").as("mean_e4"))
  }

  /** Live hourly deviation vs the static baseline: streaming (ts,
    * name) events → per (hour window, name) count, joined to
    * `baseline` (from [[hodBaseline]]); emits deviation_e4 =
    * (cnt·1e4 − mean_e4)·1e4 div mean_e4 and an `alert` flag at
    * ±`alertE4`. Inner join: a name with no baseline has no norm to
    * deviate from (first-seen names are M82's novelty surface, not
    * this one's).
    */
  def deviations(events: DataFrame, baseline: DataFrame,
      alertE4: Long = 5000L, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("name"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour_start"), col("name"), col("cnt"),
        (unix_millis(col("window.start")) % lit(86400000L) / lit(3600000L))
          .cast("long").as("hod"))
      .join(broadcast(baseline), Seq("name", "hod"))
      .withColumn("deviation_e4",
        expr("(cnt * 10000 - mean_e4) * 10000 div mean_e4"))
      .withColumn("alert", abs(col("deviation_e4")) >= alertE4)
      .select("hour_start", "name", "hod", "cnt", "mean_e4", "deviation_e4", "alert")
}
