package graft

import java.sql.Timestamp

import graft.streaming.HeatmapStream
import graft.streaming.HeatmapStream.SpanRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming heatmap cells (M75's live leg): native windowed-agg cells
  * equal the batch derivation, and read-time share arithmetic over the
  * emitted facts reproduces the batch share_e4 exactly.
  */
class HeatmapStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("streamed cells + read-side share == batch heatmap cells") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SpanRow]
    val name = s"heat_${System.nanoTime()}"
    val q = HeatmapStream.cells(
        mem.toDS().withWatermark("ts", "1 minute").as[SpanRow])
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val rows = Seq(
      SpanRow(ts(10, 0), 1L, 1L), SpanRow(ts(10, 5), 3L, 2L),
      SpanRow(ts(10, 10), 3L, 3L), SpanRow(ts(10, 40), 900L, 4L),
      SpanRow(ts(11, 1), 0L, 5L), SpanRow(ts(11, 2), 1024L, 6L),
      SpanRow(ts(11, 59), 7L, 7L))
    try {
      rows.grouped(3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(SpanRow(ts(23, 0), 1L, 999L)) // flush: closes h10/h11
      q.processAllAvailable()
      val streamed = spark.table(name)
        .where(col("hour_ms") < ts(23, 0).getTime)
      // read-side share over the emitted facts (the hour is closed)
      val withShare = streamed
        .withColumn("share_e4", expr("n_spans * 10000 div sum(n_spans) over (partition by hour_ms)"))
        .select("hour_ms", "dur_bucket", "n_spans", "share_e4")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // batch derivation (m_heatmap's shape) over the same rows
      val batch = rows.toDF()
        .select((expr("unix_millis(ts) div 3600000") * 3600000L).as("hour_ms"),
          (length(bin(col("durationMs"))).cast("long") - 1L).as("dur_bucket"))
        .groupBy("hour_ms", "dur_bucket").agg(count(lit(1)).as("n_spans"))
        .withColumn("share_e4", expr("n_spans * 10000 div sum(n_spans) over (partition by hour_ms)"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(withShare === batch)
      assert(withShare.nonEmpty && withShare.exists(_._2 == 0L)) // duration-0 bucket present
    } finally q.stop()
  }
}
