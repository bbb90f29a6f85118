package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming latency-heatmap cells — the live leg of `m_heatmap`
  * (M75): per (hour window, power-of-two duration bucket) span counts
  * as append-mode facts, emitted when the watermark closes the hour.
  *
  * Deliberately NO custom state here: a keyed count over an event-time
  * window is exactly what Spark's NATIVE windowed aggregation does
  * (partial aggregation map-side, one keyed shuffle, watermark-managed
  * state eviction) — reaching for flatMapGroupsWithState would
  * re-implement that worse. The per-hour-column share_e4 of the batch
  * query is intentionally NOT computed in-stream: an hour's total is
  * only meaningful once the hour is CLOSED, at which point its cells
  * are plain append facts and the share is stateless read-time
  * arithmetic over ≤ ~40 buckets (HeatmapStreamSpec pins that this
  * read-side division reproduces the batch share_e4 exactly).
  */
object HeatmapStream {

  /** ts = span begin; durationMs ≥ 0 (bucket 0 holds duration 0, same
    * binary-digit-count bucketing as the batch query).
    */
  case class SpanRow(ts: Timestamp, durationMs: Long, id: Long)

  /** `spans` must already carry a watermark on `ts`. Output:
    * (hour_ms, dur_bucket, n_spans).
    */
  def cells(spans: Dataset[SpanRow]): DataFrame =
    spans.toDF()
      .groupBy(window(col("ts"), "1 hour").as("w"),
        (length(bin(col("durationMs"))).cast("long") - 1L).as("dur_bucket"))
      .agg(count(lit(1)).as("n_spans"))
      .select(unix_millis(col("w.start")).as("hour_ms"),
        col("dur_bucket"), col("n_spans"))
}
