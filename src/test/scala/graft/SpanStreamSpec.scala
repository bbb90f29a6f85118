package graft

import graft.streaming.SpanStream
import graft.streaming.SpanStream.{Span, SpanEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SpanStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming stack replay emits spans with depth as ends arrive") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SpanEvent]
    val q = SpanStream.assemble(mem.toDS())
      .writeStream.format("memory").queryName("span_stream").outputMode("append").start()
    try {
      // batch 1: A opens, B opens+closes inside it — only B completes
      mem.addData(
        SpanEvent(1, 1, "A", 10, isBegin = true),
        SpanEvent(1, 2, "B", 20, isBegin = true),
        SpanEvent(1, 3, "B", 30, isBegin = false))
      q.processAllAvailable()
      val afterB = spark.table("span_stream").as[Span].collect()
      assert(afterB.toSeq === Seq(Span(1, 2, "B", 1, 20, 30, 10)))
      // batch 2: A closes — state carried the open A across batches
      mem.addData(SpanEvent(1, 4, "A", 40, isBegin = false))
      q.processAllAvailable()
      val all = spark.table("span_stream").as[Span].collect().sortBy(_.spanId)
      assert(all.toSeq === Seq(
        Span(1, 1, "A", 0, 10, 40, 30), Span(1, 2, "B", 1, 20, 30, 10)))
    } finally q.stop()
  }

  test("keys are isolated and unmatched ends are dropped") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SpanEvent]
    val q = SpanStream.assemble(mem.toDS())
      .writeStream.format("memory").queryName("span_stream2").outputMode("append").start()
    try {
      mem.addData(
        SpanEvent(1, 1, "A", 10, isBegin = true),
        SpanEvent(2, 2, "X", 5, isBegin = false), // unmatched end on key 2
        SpanEvent(2, 3, "Y", 8, isBegin = true),
        SpanEvent(2, 4, "Y", 9, isBegin = false),
        SpanEvent(1, 5, "A", 30, isBegin = false))
      q.processAllAvailable()
      val all = spark.table("span_stream2").as[Span].collect().sortBy(_.spanId)
      assert(all.toSeq === Seq(
        Span(1, 1, "A", 0, 10, 30, 20), Span(2, 3, "Y", 0, 8, 9, 1)))
    } finally q.stop()
  }
}
