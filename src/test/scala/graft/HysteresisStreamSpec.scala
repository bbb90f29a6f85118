package graft

import java.sql.Timestamp

import graft.streaming.HysteresisStream
import graft.streaming.HysteresisStream.Sample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Schmitt-trigger alerting (M105's live leg): edges only,
  * band oscillation suppressed, out-of-order-within-watermark
  * re-sequenced, alert bit carried across quiet periods.
  */
class HysteresisStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  private def drive(batches: Seq[Seq[Sample]]): Seq[(Long, Long, Boolean)] = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Sample]
    val name = s"hyst_${System.nanoTime()}"
    val q = HysteresisStream.edges(
        mem.toDS().withWatermark("ts", "1 minute").as[Sample], hi = 100.0, lo = 50.0)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(Sample(ts(59), 999L, 0.0, 9999L))
      q.processAllAvailable()
      spark.table(name).where(col("key") =!= 999L)
        .orderBy("key", "tMs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSeq
    } finally q.stop()
  }

  test("edges only: band oscillation emits nothing between fire and resolve") {
    // 120 (fire), 80, 95, 60 (band — silent), 40 (resolve), 70 (band), 110 (fire)
    val out = drive(Seq(Seq(
      Sample(ts(0), 1L, 120.0, 1L), Sample(ts(1), 1L, 80.0, 2L),
      Sample(ts(2), 1L, 95.0, 3L), Sample(ts(3), 1L, 60.0, 4L),
      Sample(ts(4), 1L, 40.0, 5L), Sample(ts(5), 1L, 70.0, 6L),
      Sample(ts(6), 1L, 110.0, 7L))))
    assert(out === Seq(
      (1L, ts(0).getTime, true),
      (1L, ts(4).getTime, false),
      (1L, ts(6).getTime, true)))
  }

  test("out-of-order within the watermark re-sequences before the state machine runs") {
    // arrival: 110@10:02 first, then 30@10:01:30 (ahead of wm 10:01) —
    // event order is 30 then 110, so exactly ONE rising edge at 10:02
    val out = drive(Seq(
      Seq(Sample(ts(2), 1L, 110.0, 2L)),
      Seq(Sample(ts(1, 30), 1L, 30.0, 1L)),
      Seq(Sample(ts(10), 1L, 70.0, 3L))))
    assert(out === Seq((1L, ts(2).getTime, true)))
  }

  private def tsh(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  /** Fire at 10:00, go quiet past a 5-min idle TTL, re-appear above HI
    * at 11:30. Ticks on key 999 advance the watermark between.
    */
  private def driveQuietGap(ttl: Option[Long]): Seq[(Long, Long, Boolean)] = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Sample]
    val name = s"hyst_ttl_${System.nanoTime()}"
    val q = HysteresisStream.edges(
        mem.toDS().withWatermark("ts", "1 minute").as[Sample],
        hi = 100.0, lo = 50.0, idleTtlMs = ttl)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val batches = Seq(
        Sample(tsh(10, 0), 1L, 150.0, 1L),   // page (once drained)
        Sample(tsh(10, 30), 999L, 0.0, 2L),
        Sample(tsh(10, 40), 999L, 0.0, 3L),  // drains key 1 → TTL armed
        Sample(tsh(11, 0), 999L, 0.0, 4L),   // idle timeout fires → drop
        Sample(tsh(11, 30), 1L, 120.0, 5L),  // re-appearance above HI
        Sample(tsh(12, 0), 999L, 0.0, 6L),
        Sample(tsh(12, 30), 999L, 0.0, 7L))  // drains the re-appearance
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table(name).where(col("key") =!= 999L)
        .orderBy("key", "tMs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSeq
    } finally q.stop()
  }

  test("idle TTL drops a quiet series: re-appearance re-pages from alert=false") {
    assert(driveQuietGap(Some(5 * 60 * 1000L)) ===
      Seq((1L, tsh(10, 0).getTime, true), (1L, tsh(11, 30).getTime, true)))
  }

  test("without idle TTL the alert bit is retained across the same quiet gap") {
    // identical timeline: the 11:30 sample is band-silent (already firing)
    assert(driveQuietGap(None) === Seq((1L, tsh(10, 0).getTime, true)))
  }

  test("alert bit survives quiet periods; per-key isolation") {
    val out = drive(Seq(
      Seq(Sample(ts(0), 1L, 150.0, 1L), Sample(ts(0), 2L, 20.0, 2L)),
      Seq(Sample(ts(20), 1L, 90.0, 3L)),  // still firing (band)
      Seq(Sample(ts(30), 1L, 10.0, 4L)))) // resolve
    assert(out === Seq(
      (1L, ts(0).getTime, true),
      (1L, ts(30).getTime, false)))
  }
}
