package graft

import java.sql.Timestamp

import graft.streaming.TransitionStream
import graft.streaming.TransitionStream.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming journey transitions (M99's live leg): watermark-ordered
  * per-user lag pairs with out-of-order arrival handled by the
  * watermark buffer, matching the batch m_transition_matrix step
  * derivation exactly.
  */
class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  private def drive(batches: Seq[Seq[UserEvent]]): Seq[(Long, String, String, Long)] = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = TransitionStream.transitions(
        mem.toDS().withWatermark("ts", "1 minute").as[UserEvent])
      .writeStream.format("memory").queryName("transitions").outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // close the watermark over everything pending
      mem.addData(UserEvent(ts(59), 999L, "flush", 9999L))
      q.processAllAvailable()
      spark.table("transitions").where(col("userId") =!= 999L)
        .orderBy("userId", "tMs")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    } finally q.stop()
  }

  test("in-order events emit lag-1 transitions per user") {
    val out = drive(Seq(Seq(
      UserEvent(ts(0), 1L, "signup", 1L),
      UserEvent(ts(1), 1L, "view", 2L),
      UserEvent(ts(2), 1L, "purchase", 3L),
      UserEvent(ts(1), 2L, "view", 4L),
      UserEvent(ts(3), 2L, "error", 5L))))
    assert(out === Seq(
      (1L, "signup", "view", ts(1).getTime),
      (1L, "view", "purchase", ts(2).getTime),
      (2L, "view", "error", ts(3).getTime)))
  }

  test("out-of-order arrival within the watermark is re-sequenced by event time") {
    // arrival order: view(10:02) first, then signup(10:01:30) — older
    // in event time but still AHEAD of the watermark (10:01), so the
    // buffer re-sequences and the emitted chain is signup → view, not
    // view → signup. (An event BEHIND the watermark is dropped by the
    // operator's late filter — that's the watermark contract, tested
    // implicitly by the 1-minute delay here.)
    val out = drive(Seq(
      Seq(UserEvent(ts(2), 1L, "view", 2L)),
      Seq(UserEvent(ts(1, 30), 1L, "signup", 1L)),
      Seq(UserEvent(ts(10), 1L, "purchase", 3L))))
    assert(out === Seq(
      (1L, "signup", "view", ts(2).getTime),
      (1L, "view", "purchase", ts(10).getTime)))
  }

  test("carry survives quiet periods: first event after a drain still links back") {
    val out = drive(Seq(
      Seq(UserEvent(ts(0), 1L, "signup", 1L)),
      Seq(UserEvent(ts(30), 1L, "flushA", 90L)), // advances watermark past signup
      Seq(UserEvent(ts(40), 1L, "view", 2L))))
    // signup drained long before view arrived; the carried last-state
    // must still produce signup → flushA? No — flushA is user 1's own
    // event here, so the chain is signup → flushA → view
    assert(out === Seq(
      (1L, "signup", "flushA", ts(30).getTime),
      (1L, "flushA", "view", ts(40).getTime)))
  }
}
