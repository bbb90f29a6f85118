package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming in-flight concurrency timeline — the live leg of
  * `m_concurrency` (M74's sweep line): span open/close deltas fold
  * into per-minute (n_opened, n_closed) cells, and when the watermark
  * closes a minute it emits that minute's row with the RUNNING
  * open-at-end counter — the streaming prefix sum the batch query
  * computes with its (whitelisted, wall-clock-bounded) global window.
  *
  * State design: within a minute the net is COMMUTATIVE, so the
  * buffer is not raw deltas but per-minute (opened, closed) cells —
  * merge on arrival, order-free; only minute ORDER matters, applied at
  * emission. State is therefore O(open minutes within watermark) + one
  * carried counter, regardless of span volume. A minute emits exactly
  * once, when the watermark passes its end (late deltas behind the
  * watermark are dropped by Spark's stateful late filter — the same
  * event-time contract as every stream here; size the delay above
  * timestamp granularity).
  *
  * Scale note: the timeline fold is a SINGLE key by construction (a
  * global counter is inherently ordered). That is the correct
  * two-stage shape, not a bottleneck: the volume-bearing work
  * (per-minute cell merging) is commutative and is pre-collapsed by an
  * upstream windowed aggregation in the production topology (the M3
  * incremental-stats pattern), leaving this fold O(elapsed minutes) —
  * the same bound the batch query's whitelisted global window
  * documents. That composition is REAL, not aspirational: [[fromCells]]
  * is the fold's cell-fed leg, and ConcurrencyPropSpec runs the full
  * two-stage pipeline (streaming window agg → window_time → fold) as
  * one query, equivalence-pinned against the batch sweep-line.
  * Per-process timelines shard naturally by keying on process_id
  * instead.
  */
object ConcurrencyStream {

  /** delta: +1 = span opens at ts, -1 = span closes at ts. */
  case class SpanDelta(ts: Timestamp, delta: Long, id: Long)

  /** A pre-aggregated (possibly PARTIAL) per-minute cell: `opened`
    * opens and `closed` closes observed at event time `ts` (any instant
    * inside the cell's minute). The production stage-1 shape: an
    * upstream windowed aggregation collapses raw span deltas into one
    * cell per minute before they reach the single-key global fold, so
    * the fold's input volume is O(elapsed minutes), not O(spans).
    * Partial cells for the same minute merge commutatively downstream.
    */
  case class MinuteCell(ts: Timestamp, opened: Long, closed: Long)

  case class MinuteRow(minuteMs: Long, nOpened: Long, nClosed: Long, openAtEnd: Long)

  /** acc = (minuteMs, opened, closed) cells still ahead of the
    * watermark; open = the carried open-span counter.
    */
  case class ConcState(acc: List[(Long, Long, Long)], open: Long)

  /** `deltas` must already carry a watermark on `ts`. */
  def minuteRows(deltas: Dataset[SpanDelta],
      minuteLenMs: Long = 60000L): Dataset[MinuteRow] =
    // extraction happens INSIDE the fold: a .map to cells first would
    // re-serialize through a plan hop that drops the event-time
    // watermark metadata, and fMGWS's event-time timeout then fails
    // analysis ("Event-time timeout not supported without watermark")
    fold(deltas, minuteLenMs)(d => (d.ts.getTime,
      if (d.delta > 0) 1L else 0L, if (d.delta > 0) 0L else 1L))

  /** The two-stage production topology's stage 2: the same global fold
    * over cells an upstream windowed aggregation already collapsed
    * (stage 1 — the M3 incremental-stats pattern), so the single-key
    * fold sees O(elapsed minutes) rows regardless of span volume.
    * `cells` must carry a watermark on `ts`; per-minute merge is
    * commutative, so partial cells (e.g. one per upstream shard) are
    * fine. Equivalence with the direct path is pinned by
    * ConcurrencyPropSpec.
    */
  def fromCells(cells: Dataset[MinuteCell],
      minuteLenMs: Long = 60000L): Dataset[MinuteRow] =
    fold(cells, minuteLenMs)(c => (c.ts.getTime, c.opened, c.closed))

  /** Shared single-key watermark fold; `ext` extracts (eventTimeMs,
    * opened, closed) from an input row.
    */
  private def fold[T](in: Dataset[T], minuteLenMs: Long)(
      ext: T => (Long, Long, Long)): Dataset[MinuteRow] = {
    require(minuteLenMs > 0, s"minuteLenMs must be positive: $minuteLenMs")
    implicit val outEnc = Encoders.product[MinuteRow]
    implicit val stateEnc = Encoders.product[ConcState]
    implicit val keyEnc = Encoders.scalaLong
    in.groupByKey(_ => 0L)
      .flatMapGroupsWithState[ConcState, MinuteRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, batch, state: GroupState[ConcState]) =>
          val old = state.getOption.getOrElse(ConcState(Nil, 0L))
          val wm = state.getCurrentWatermarkMs()
          val acc = scala.collection.mutable.Map.empty[Long, (Long, Long)]
          old.acc.foreach { case (m, o, c) => acc(m) = (o, c) }
          batch.foreach { row =>
            val (tsMs, opened, closed) = ext(row)
            val m = Math.floorDiv(tsMs, minuteLenMs) * minuteLenMs
            val (o, c) = acc.getOrElse(m, (0L, 0L))
            acc(m) = (o + opened, c + closed)
          }
          // a minute is closed once the watermark passes its END: every
          // on-time delta of that minute has necessarily arrived
          val (ready, pending) = acc.toList.partition(_._1 + minuteLenMs - 1 <= wm)
          var open = old.open
          val out = ready.sortBy(_._1).map { case (m, (o, c)) =>
            open += o - c
            MinuteRow(m, o, c, open)
          }
          state.update(ConcState(
            pending.map { case (m, (o, c)) => (m, o, c) }, open))
          if (pending.nonEmpty) {
            state.setTimeoutTimestamp(
              math.max(pending.map(_._1).min + minuteLenMs - 1, wm + 1))
          }
          out.iterator
      }
  }
}
