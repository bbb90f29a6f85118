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
