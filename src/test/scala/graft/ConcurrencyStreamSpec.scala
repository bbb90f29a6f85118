package graft

import java.sql.Timestamp

import graft.streaming.ConcurrencyStream
import graft.streaming.ConcurrencyStream.SpanDelta
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming concurrency timeline (M74's live leg): per-minute
  * open/close cells + the carried open-at-end prefix, minutes emitted
  * exactly once when the watermark closes them, counter carried across
  * inactive gaps.
  */
class ConcurrencyStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  private def drive(batches: Seq[Seq[SpanDelta]]): Seq[(Long, Long, Long, Long)] = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SpanDelta]
    val name = s"conc_${System.nanoTime()}"
    val q = ConcurrencyStream.minuteRows(
        mem.toDS().withWatermark("ts", "1 minute").as[SpanDelta])
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // flush: a far-future tick closes every buffered minute (its own
      // minute stays open and is filtered by the time bound below)
      mem.addData(SpanDelta(ts(59), 1L, 9999L))
      q.processAllAvailable()
      spark.table(name).where(col("minuteMs") < ts(58).getTime)
        .orderBy("minuteMs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    } finally q.stop()
  }

  test("per-minute cells + running open-at-end; gaps carry the counter") {
    // minute 0: open 2, close 0 -> open 2; minute 1: open 1 close 1 ->
    // open 2; minute 5 (gap before it): close 2 -> open 0
    val out = drive(Seq(Seq(
      SpanDelta(ts(0, 5), 1L, 1L), SpanDelta(ts(0, 40), 1L, 2L),
      SpanDelta(ts(1, 10), 1L, 3L), SpanDelta(ts(1, 30), -1L, 4L),
      SpanDelta(ts(5, 0), -1L, 5L), SpanDelta(ts(5, 1), -1L, 6L))))
    assert(out === Seq(
      (ts(0).getTime, 2L, 0L, 2L),
      (ts(1).getTime, 1L, 1L, 2L),
      (ts(5).getTime, 0L, 2L, 0L)))
  }

  test("a minute emits exactly once, when the watermark passes its end") {
    // deltas for minute 3 arrive across TWO batches, both ahead of the
    // watermark — the minute must emit once, with both merged
    val out = drive(Seq(
      Seq(SpanDelta(ts(3, 10), 1L, 1L)),
      Seq(SpanDelta(ts(3, 50), 1L, 2L)),
      Seq(SpanDelta(ts(10, 0), -1L, 3L))))
    assert(out === Seq(
      (ts(3).getTime, 2L, 0L, 2L),
      (ts(10).getTime, 0L, 1L, 1L)))
  }
}
