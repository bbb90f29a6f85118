package graft.streaming

import graft.operators.Robust
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming robust-anomaly alerting — the live leg of
  * `m_log_anomaly_mad` (M96), same stream-STATIC join pattern as
  * [[BaselineStream]]: live watermarked hourly counts broadcast-joined
  * to a batch-materialized per-name (median, MAD) baseline.
  *
  * Why median/MAD live: a mean-based live baseline (BaselineStream)
  * re-centers on every incident — yesterday's outage inflates today's
  * "normal". The robust baseline is immune to the very bursts it
  * exists to flag, so the batch side can be materialized over weeks of
  * history WITHOUT first scrubbing incidents out of it. The streaming
  * side never maintains median state (a streaming median is not
  * sum-mergeable); the baseline is a batch product, re-planned per
  * micro-batch, so a nightly re-materialization is picked up live.
  */
object RobustStream {

  /** Batch side: (ts, name) events → per-name (med2, mad4) over the
    * dense hour grid — exactly the m_log_anomaly_mad baseline.
    */
  def hourlyMadBaseline(events: DataFrame): DataFrame = {
    val ms = unix_millis(col("ts"))
    val hourly = events
      .groupBy(col("name"), (ms - pmod(ms, lit(3600000L))).as("hour_ms"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    Robust.madBaseline(Robust.denseHourly(hourly))
  }

  /** Live side: streaming (ts, name) events → watermarked hourly
    * counts, robust-z scored against the static baseline. Alert at
    * score ≥ `alertScoreE4` (default 5×MAD, the batch query's flag
    * threshold). Inner join: a name with no baseline has no norm —
    * first-seen names are the novelty surface (M82), not this one's.
    */
  def deviations(events: DataFrame, baseline: DataFrame,
      alertScoreE4: Long = 50000L, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("name"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour_start"), col("name"), col("cnt"))
      .join(broadcast(baseline), Seq("name"))
      .withColumn("score_e4", expr(Robust.scoreE4Sql))
      .withColumn("alert", col("score_e4") >= alertScoreE4)
      .select("hour_start", "name", "cnt", "med2", "mad4", "score_e4", "alert")
}
