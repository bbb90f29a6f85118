package graft.streaming

import graft.operators.Cms
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterparts of the R5 sketch/alert operators.
  *
  *  - [[cmsCells]]: the Count-Min sketch as windowed streaming state —
  *    per event-time window, the same (j, bucket, cell) table the
  *    batch build produces, incremented per micro-batch. The sketch's
  *    sum-merge property is exactly Structured Streaming's partial-agg
  *    contract, so the streamed cells are bit-identical to a batch
  *    build over the same window (SketchStreamSpec pins this).
  *  - [[burnRate]]: hourly SLO burn emission — the streaming layer
  *    publishes per-hour (total, errors, ratio_e6, over_budget); the
  *    multiwindow page decision (m_burn_rate) runs downstream on the
  *    emitted bins, where both windows are closed.
  *
  * State is watermark-bounded in both: closed windows stop accepting
  * late rows, matching the closed-partition semantics of the batch
  * materializer.
  */
object SketchStream {

  /** Windowed CMS cells over a streaming document frame
    * (ts timestamp, text string): (time_bin, j, bucket, cell).
    */
  def cmsCells(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("ts"), explode(Cms.hashes(col("tok"))).as("hb"))
      .groupBy(window(col("ts"), "1 minute"),
        col("hb.j").as("j"), col("hb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cell"))
      .select(col("window.start").as("time_bin"), col("j"), col("bucket"), col("cell"))

  /** Per-window power-of-two duration-bucket sketch over a streaming
    * spans frame (end_ts timestamp, name string, duration_ms long):
    * (win_start, name, bucket, n) — the live layer of the
    * m_duration_shift KS family. Bucket counts are sum-mergeable, so
    * the streamed sketch is bit-identical to a batch build over the
    * same window (partial-agg contract, as with [[cmsCells]]); the
    * distribution-shift decision itself ([[ksBetweenWindows]]) runs
    * downstream on closed windows, where both sketches are complete —
    * the same layering as [[burnRate]] vs m_burn_rate's page decision.
    */
  def durationBuckets(spans: DataFrame, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    spans
      .withWatermark("end_ts", watermark)
      .groupBy(window(col("end_ts"), windowLen), col("name"),
        (length(bin(col("duration_ms"))).cast("long") - 1L).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("name"), col("bucket"), col("n"))

  /** Two-sample KS between each window's sketch and the SAME name's
    * previous window — batch post-processing of [[durationBuckets]]
    * emissions (cells: win_start, name, bucket, n). Dense grid over
    * the union of observed buckets per name so a bucket present in
    * only one window still moves the CDF; all work lives on
    * names × windows × ≤42-bucket rows, never on spans.
    */
  def ksBetweenWindows(cells: DataFrame, windowLenMs: Long = 3600000L,
      maxBucket: Int = 41): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = cells.sparkSession
    val keys = cells.select("win_start", "name").distinct()
    val buckets = s.range(maxBucket + 1).select(col("id").as("bucket"))
    // keys derives from cells, so the grid join is a self-join; rename
    // the probe side to fresh attributes to break the ambiguity
    val c = cells.select(col("win_start").as("c_ws"), col("name").as("c_nm"),
      col("bucket").as("c_b"), col("n").as("c_n"))
    val grid = keys.crossJoin(broadcast(buckets))
      .join(c, col("win_start") === col("c_ws") && col("name") === col("c_nm") &&
        col("bucket") === col("c_b"), "left")
      .select(col("win_start"), col("name"), col("bucket"),
        coalesce(col("c_n"), lit(0L)).as("n"))
    val cw = Window.partitionBy("win_start", "name").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.partitionBy("win_start", "name")
    val cdf = grid.withColumn("cum", sum("n").over(cw))
      .withColumn("total", sum("n").over(tw))
      .withColumn("cdf_e4", expr("cum * 10000 div total"))
    // prev derives from cdf (another self-join): fresh attribute names
    val prev = cdf.select(
      (col("win_start").cast("long") * 1000L + windowLenMs).as("p_ms"),
      col("name").as("p_nm"), col("bucket").as("p_b"),
      col("cdf_e4").as("prev_cdf_e4"), col("total").as("prev_total"))
    cdf.withColumn("t_ms", col("win_start").cast("long") * 1000L)
      .join(prev, col("t_ms") === col("p_ms") && col("name") === col("p_nm") &&
        col("bucket") === col("p_b"))
      .groupBy("win_start", "name")
      .agg(max(abs(col("cdf_e4") - col("prev_cdf_e4"))).as("ks_e4"),
        max("total").as("n"), max("prev_total").as("n_prev"))
  }

  /** Hourly error-budget burn over a streaming events frame
    * (ts timestamp, event_type string): (hour, total, errors,
    * ratio_e6, over_budget). Integer e6 ratio — same arithmetic as
    * the batch m_burn_rate hourly stage.
    */
  def burnRate(events: DataFrame, sloRatioE6: Long = 250000L,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))
      .select(col("window.start").as("hour"), col("total"), col("errors"),
        expr("errors * 1000000 div total").as("ratio_e6"))
      .withColumn("over_budget", (col("ratio_e6") >= sloRatioE6).cast("long"))
}
