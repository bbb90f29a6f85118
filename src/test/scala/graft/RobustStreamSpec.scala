package graft

import java.sql.Timestamp

import graft.streaming.RobustStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static robust anomaly (M96's live leg): watermarked hourly
  * counts scored against a batch median/MAD baseline with the exact
  * batch arithmetic, and the baseline itself outlier-immune.
  */
class RobustStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$minute%02d:00")

  test("hourlyMadBaseline: integer med2/mad4 over the dense grid, burst-immune") {
    // 6-hour span for "api": counts 2,2,2,0(absent),2,100 — the historical
    // burst must NOT drag the median the way it would a mean
    val hist = (
      (1 to 2).map(m => NamedEvent(ts(1, 9, m), "api")) ++
      (1 to 2).map(m => NamedEvent(ts(1, 10, m), "api")) ++
      (1 to 2).map(m => NamedEvent(ts(1, 11, m), "api")) ++
      // hour 12 absent entirely → dense zero cell
      (1 to 2).map(m => NamedEvent(ts(1, 13, m), "api")) ++
      (1 to 40).map(m => NamedEvent(ts(1, 14, m), "api"))).toDF()
    val b = RobustStream.hourlyMadBaseline(hist).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // counts sorted: 0,2,2,2,2,40 → med2 = 2+2 = 4 (median 2)
    // dev2 = |2c-4|: 4,0,0,0,0,76 → sorted 0,0,0,0,4,76 → mad4 = 0+0 = 0
    assert(b("api") === ((4L, 0L)), "burst-immune doubled order statistics")
  }

  test("stream-static join: robust-z scoring with the batch e4 arithmetic") {
    implicit val sc = spark.sqlContext
    // baseline: median 2 (med2=4), MAD 1 (mad4=4)
    val baseline = Seq(("api", 4L, 4L)).toDF("name", "med2", "mad4")
    val mem = MemoryStream[NamedEvent]
    val q = RobustStream.deviations(mem.toDF(), baseline)
      .writeStream.format("memory").queryName("robust_devs").outputMode("update").start()
    try {
      // live hour 9: 8 events → |8-2|/1 = 6×MAD → score 60000, alert
      mem.addData((1 to 8).map(m => NamedEvent(ts(3, 9, m), "api")): _*)
      // live hour 10: 2 events → on-median, score 0, quiet
      mem.addData((1 to 2).map(m => NamedEvent(ts(3, 10, m), "api")): _*)
      // baseline-less name must not surface (inner join)
      mem.addData(NamedEvent(ts(3, 9, 30), "brand_new"))
      q.processAllAvailable()
      val out = spark.table("robust_devs")
        .groupBy("name", "hour_start").agg(max("cnt").as("cnt"),
          last("score_e4").as("score"), last("alert").as("alert"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      assert(out(("api", ts(3, 9))) === ((8L, 60000L, true)), "6xMAD pages")
      assert(out(("api", ts(3, 10))) === ((2L, 0L, false)), "on-median stays quiet")
      assert(!out.exists(_._1._1 == "brand_new"), "baseline-less names are novelty, not deviation")
    } finally q.stop()
  }

  test("zero-MAD baseline: greatest(mad4,1) guard keeps scores finite and exact") {
    implicit val sc = spark.sqlContext
    val baseline = Seq(("flat", 4L, 0L)).toDF("name", "med2", "mad4")
    val mem = MemoryStream[NamedEvent]
    val q = RobustStream.deviations(mem.toDF(), baseline)
      .writeStream.format("memory").queryName("robust_devs_flat").outputMode("update").start()
    try {
      mem.addData((1 to 3).map(m => NamedEvent(ts(3, 9, m), "flat")): _*)
      q.processAllAvailable()
      val r = spark.table("robust_devs_flat")
        .orderBy(desc("cnt")).select("cnt", "score_e4", "alert").head()
      // cnt 3, med2 4 → dev2=2 → score = 2*2*10000 div max(0,1) = 40000
      assert((r.getLong(0), r.getLong(1), r.getBoolean(2)) === ((3L, 40000L, false)))
    } finally q.stop()
  }
}
