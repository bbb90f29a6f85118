package graft

import java.sql.Timestamp

import graft.streaming.LogStatsStream

/** The deployment path for the streaming rollup: file source →
  * watermarked aggregation → checkpointed parquet sink in APPEND mode.
  * Each closed window must land exactly once, including across a
  * stop/restart from the same checkpoint (exactly-once resume).
  */
class StreamSinkSpec extends SparkSpec with TmpDirSupport {
  import spark.implicits._


  private def t(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  private def ev(ts: Timestamp, et: String) = Ev(ts, 1L, et, 1.0)

  test("checkpointed parquet sink: closed windows land exactly once across restart") {
    val in = tmpDir("graft-sink-in")
    val out = tmpDir("graft-sink-out")
    val chk = tmpDir("graft-sink-chk")
    val schema = Seq(ev(t(0), "error")).toDF().schema

    def append(rows: Ev*): Unit =
      rows.toDF().write.mode("append").parquet(in)

    def start() = LogStatsStream
      .logStats(spark.readStream.schema(schema).parquet(in), watermark = "2 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()

    def sinkRows(): Seq[(String, Int, Long)] =
      spark.read.parquet(out).select("time_bin", "level", "count").collect()
        .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getLong(2))).toSeq

    // minute-0 errors + a minute-5 view; watermark after the first
    // batch is 10:03, so the minute-0 window closes on the NEXT trigger
    append(ev(t(0, 10), "error"), ev(t(0, 20), "error"), ev(t(5), "view"))
    val q1 = start()
    try {
      q1.processAllAvailable()
      append(ev(t(10), "view")) // wm → 10:08 after this batch
      q1.processAllAvailable()
    } finally q1.stop()

    val firstRows = sinkRows()
    assert(firstRows.contains(("2024-01-01 10:00:00.0", 2, 2L)),
      s"minute-0 error window missing: $firstRows")

    // restart from the SAME checkpoint with more data: already-emitted
    // windows must NOT re-emit
    append(ev(t(20), "view")) // wm → 10:18: minute-5 and minute-10 close
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val all = sinkRows()
    assert(all.count(_ == (("2024-01-01 10:00:00.0", 2, 2L))) === 1,
      s"minute-0 window duplicated after restart: $all")
    assert(all.contains(("2024-01-01 10:05:00.0", 5, 1L)),
      s"minute-5 view window missing after restart: $all")
    // every (window, level) appears exactly once — append-mode contract
    assert(all.groupBy(r => (r._1, r._2)).values.forall(_.size == 1),
      s"duplicate windows: $all")
  }
}
