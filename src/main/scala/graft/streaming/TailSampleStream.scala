package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tail-based trace sampling — the production shape of
  * m_tail_sampling: the keep/drop decision CANNOT be made per event
  * (it depends on the whole trace), so per-trace state accumulates
  * span statistics and the verdict is emitted exactly once, when the
  * event-time watermark passes the trace's quiet period (the
  * collector's "trace is complete" heuristic). State is O(1) per
  * open trace — five longs — regardless of trace size.
  */
object TailSampleStream {

  /** One finished span: `ts` is the span's END event time (the
    * watermark column), so trace completion = no new end for quietMs.
    */
  case class SpanStat(ts: java.sql.Timestamp, key: Long, durationMs: Long, depth: Long)
  case class TraceAgg(nSpans: Long, minBegin: Long, maxEnd: Long, maxDepth: Long)
  case class Verdict(key: Long, nSpans: Long, wallMs: Long, maxDepth: Long,
      keepSlow: Long, keepDeep: Long, keepSample: Long, keep: Long)

  /** md5-prefix hash sample — the same deterministic 10% as the batch
    * operator (no RNG, identical across engines and replays).
    */
  private def inSample(key: Long, cutE32: Long): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) < cutE32
  }

  /** Emit one Verdict per trace once its quiet period expires (state
    * timeout on event time — requires a watermark on the input).
    */
  def decide(spans: Dataset[SpanStat], slowWallMs: Long = 2000000000L,
      deepDepth: Long = 4L, sampleCutE32: Long = 429496730L,
      quietMs: Long = 600000L): Dataset[Verdict] = {
    implicit val verdictEnc = Encoders.product[Verdict]
    implicit val stateEnc = Encoders.product[TraceAgg]
    implicit val keyEnc = Encoders.scalaLong
    spans.groupByKey(_.key)
      .flatMapGroupsWithState[TraceAgg, Verdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, batch, state: GroupState[TraceAgg]) =>
          if (state.hasTimedOut) {
            // quiet period passed: the trace is complete — decide
            val agg = state.get
            state.remove()
            val wall = agg.maxEnd - agg.minBegin
            val keepSlow = if (wall >= slowWallMs) 1L else 0L
            val keepDeep = if (agg.maxDepth >= deepDepth) 1L else 0L
            val keepSample = if (inSample(key, sampleCutE32)) 1L else 0L
            Iterator.single(Verdict(key, agg.nSpans, wall, agg.maxDepth,
              keepSlow, keepDeep, keepSample,
              math.max(keepSlow, math.max(keepDeep, keepSample))))
          } else {
            val prev = state.getOption.getOrElse(TraceAgg(0L, Long.MaxValue, Long.MinValue, -1L))
            val agg = batch.foldLeft(prev) { (a, s) =>
              val endMs = s.ts.getTime
              TraceAgg(a.nSpans + 1, math.min(a.minBegin, endMs - s.durationMs),
                math.max(a.maxEnd, endMs), math.max(a.maxDepth, s.depth))
            }
            state.update(agg)
            // trace completes when no span END arrives for quietMs
            state.setTimeoutTimestamp(agg.maxEnd + quietMs)
            Iterator.empty
          }
      }
  }
}
