package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming hysteresis (Schmitt-trigger) alerting — the live leg of
  * `m_hysteresis_alerts` (M105): per series, fire when the value
  * crosses HI, clear only below LO, emitting ONLY the edges (a page on
  * rising, a resolve on falling); oscillation inside the band emits
  * nothing. State per series is O(pending-within-watermark + 1): the
  * watermark buffer (same event-time discipline as [[TransitionStream]]
  * — arrival order is noise, event order is the contract, and a row AT
  * the watermark is dropped by Spark's late filter, so size the delay
  * above the source's timestamp granularity) plus one carried alert
  * bit. This is what an alerting pipeline actually pages from: edges,
  * not levels — downstream needs no dedup.
  */
object HysteresisStream {

  case class Sample(ts: Timestamp, key: Long, value: Double, id: Long)

  /** firing=true is the page (rising edge), false the resolve. */
  case class AlertEdge(key: Long, tMs: Long, value: Double, firing: Boolean)

  case class HystState(pending: List[(Long, Long, Double)], alert: Boolean)

  /** `samples` must already carry a watermark on `ts`. */
  def edges(samples: Dataset[Sample], hi: Double, lo: Double): Dataset[AlertEdge] = {
    require(hi > lo, s"hysteresis band requires hi > lo (got hi=$hi, lo=$lo)")
    implicit val outEnc = Encoders.product[AlertEdge]
    implicit val stateEnc = Encoders.product[HystState]
    implicit val keyEnc = Encoders.scalaLong
    samples.groupByKey(_.key)
      .flatMapGroupsWithState[HystState, AlertEdge](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, batch, state: GroupState[HystState]) =>
          val old = state.getOption.getOrElse(HystState(Nil, alert = false))
          val wm = state.getCurrentWatermarkMs()
          val all = old.pending ++ batch.map(s => (s.ts.getTime, s.id, s.value))
          val (ready, pending) = all.partition(_._1 <= wm)
          var alert = old.alert
          val out = List.newBuilder[AlertEdge]
          ready.sortBy(s => (s._1, s._2)).foreach { case (t, _, v) =>
            if (!alert && v > hi) { alert = true; out += AlertEdge(key, t, v, firing = true) }
            else if (alert && v < lo) { alert = false; out += AlertEdge(key, t, v, firing = false) }
            // inside the band (lo ≤ v ≤ hi): state holds, nothing emits
          }
          state.update(HystState(pending, alert))
          if (pending.nonEmpty) {
            state.setTimeoutTimestamp(math.max(pending.map(_._1).min, wm + 1))
          }
          out.result().iterator
      }
  }
}
