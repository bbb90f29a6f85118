package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming span assembly: the stack replay the reference performs in
  * its JIT ETL (reference: rust/analytics/src/call_tree.rs) expressed
  * as Structured Streaming custom state — one stack per key held in
  * `flatMapGroupsWithState`, spans emitted as soon as their end event
  * arrives. State is O(open spans) per key, not O(events).
  */
object SpanStream {

  case class SpanEvent(key: Long, eventId: Long, name: String, tMs: Long, isBegin: Boolean)
  case class Span(key: Long, spanId: Long, name: String, depth: Int,
      beginMs: Long, endMs: Long, durationMs: Long)
  case class StackState(open: List[(Long, String, Long)]) // (spanId, name, beginMs)

  /** Per-key stack replay. Events within a batch are processed in
    * (tMs, eventId) order; an end event closes the innermost open span.
    * Unmatched ends on a malformed stream are dropped.
    */
  def assemble(events: Dataset[SpanEvent]): Dataset[Span] = {
    implicit val spanEnc = Encoders.product[Span]
    implicit val stateEnc = Encoders.product[StackState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.key)
      .flatMapGroupsWithState[StackState, Span](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, batch, state: GroupState[StackState]) =>
          var stack = state.getOption.map(_.open).getOrElse(Nil)
          val out = List.newBuilder[Span]
          batch.toSeq.sortBy(e => (e.tMs, e.eventId)).foreach { e =>
            if (e.isBegin) {
              stack = (e.eventId, e.name, e.tMs) :: stack
            } else stack match {
              case (spanId, name, beginMs) :: rest =>
                out += Span(key, spanId, name, rest.length, beginMs, e.tMs, e.tMs - beginMs)
                stack = rest
              case Nil => () // unmatched end: malformed stream, drop
            }
          }
          state.update(StackState(stack))
          out.result().iterator
      }
  }
}
