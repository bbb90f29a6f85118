package graft

import java.sql.Timestamp

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming funnel (M67's live leg): in-order step achievement with
  * a conversion window, one append-mode fact per achieve, re-achieves
  * suppressed, out-of-order-within-watermark re-sequenced.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  private val stepTypes = Seq("signup", "view", "purchase")

  private def drive(batches: Seq[Seq[UserEvent]],
      windowMs: Long = 10 * 60000L): Seq[(Long, Int, Long)] = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val name = s"funnel_${System.nanoTime()}"
    val q = FunnelStream.steps(
        mem.toDS().withWatermark("ts", "1 minute").as[UserEvent],
        stepTypes, windowMs)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(UserEvent(ts(59), 999L, "flush", 9999L))
      q.processAllAvailable()
      spark.table(name).where(col("userId") =!= 999L)
        .orderBy("userId", "step")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    } finally q.stop()
  }

  test("full conversion in order; step events outside the window stall the funnel") {
    val out = drive(Seq(Seq(
      // user 1: signup@0 -> view@5 -> purchase@8: full funnel
      UserEvent(ts(0), 1L, "signup", 1L), UserEvent(ts(5), 1L, "view", 2L),
      UserEvent(ts(8), 1L, "purchase", 3L),
      // user 2: signup@0, view@20 (outside the 10-min window): stalls at 1
      UserEvent(ts(0), 2L, "signup", 4L), UserEvent(ts(20), 2L, "view", 5L),
      // user 3: view@1 then purchase@2 but NO signup: nothing achieves
      UserEvent(ts(1), 3L, "view", 6L), UserEvent(ts(2), 3L, "purchase", 7L))))
    assert(out === Seq(
      (1L, 1, ts(0).getTime), (1L, 2, ts(5).getTime), (1L, 3, ts(8).getTime),
      (2L, 1, ts(0).getTime)))
  }

  test("out-of-order arrival within the watermark re-sequences: min qualifying view wins") {
    // view@7 arrives BEFORE view@3 within one batch (both ahead of the
    // watermark) — event order is 3 then 7, so step 2 achieves at
    // minute 3 (the chained-min semantics of the batch query)
    val out = drive(Seq(
      Seq(UserEvent(ts(0), 1L, "signup", 1L)),
      Seq(UserEvent(ts(7), 1L, "view", 2L), UserEvent(ts(3), 1L, "view", 3L)),
      Seq(UserEvent(ts(30), 1L, "click", 4L))))
    assert(out === Seq((1L, 1, ts(0).getTime), (1L, 2, ts(3).getTime)))
  }

  test("re-achieves suppressed; same-timestamp next step does not qualify (strict >)") {
    val out = drive(Seq(Seq(
      UserEvent(ts(0), 1L, "signup", 1L),
      UserEvent(ts(0), 1L, "view", 2L),     // t == t1: strict > excludes
      UserEvent(ts(2), 1L, "signup", 3L),   // second signup: ignored
      UserEvent(ts(4), 1L, "view", 4L),     // qualifies
      UserEvent(ts(6), 1L, "view", 5L))))   // already at step 2: ignored
    assert(out === Seq((1L, 1, ts(0).getTime), (1L, 2, ts(4).getTime)))
  }
}
