package graft

import java.sql.Timestamp

import graft.streaming.SketchStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CMS + burn-rate: the sketch's sum-merge property must
  * make the streamed cells bit-identical to a batch build over the
  * same window, and the burn emission must match the batch integer
  * ratio arithmetic.
  */
case class SpanRow(end_ts: Timestamp, name: String, duration_ms: Long)

class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Int, minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:$sec%02d")

  test("streaming CMS cells merge across micro-batches to the batch sketch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = SketchStream.cmsCells(mem.toDF(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("cms_cells").outputMode("update").start()
    try {
      mem.addData(StreamDoc(ts(10, 0, 10), 1, "the cat sat"),
        StreamDoc(ts(10, 0, 20), 2, "the dog"))
      q.processAllAvailable()
      mem.addData(StreamDoc(ts(10, 0, 40), 3, "the cat"))
      q.processAllAvailable()
      // update mode re-emits a window's cells as they grow: the final
      // value per cell is the max emission
      val streamed = spark.table("cms_cells")
        .where(col("time_bin") === ts(10, 0))
        .groupBy("j", "bucket").agg(max("cell").as("cell"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.operators.Cms.cells(
          Seq("the cat sat", "the dog", "the cat").toDF("text")
            .select(explode(split(col("text"), " ")).as("tok")), "tok")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch, "streamed cells must equal the batch sketch")
    } finally q.stop()
  }

  test("streaming tail sampling: verdict emitted once per trace when the quiet period expires") {
    import graft.streaming.TailSampleStream
    import graft.streaming.TailSampleStream.SpanStat
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SpanStat]
    val q = TailSampleStream.decide(
        mem.toDS().withWatermark("ts", "1 minute"),
        slowWallMs = 100000L, deepDepth = 3L, quietMs = 60000L)
      .writeStream.format("memory").queryName("tail_verdicts")
      .outputMode("append").start()
    try {
      // trace 1: deep (depth 5) and slow (>100s wall); trace 2: one
      // shallow 200ms span. All ends within 2 minutes, so the first
      // batch's watermark (max - 1m) is still inside both quiet windows
      mem.addData(SpanStat(ts(10, 0), 1L, 1000L, 5L), SpanStat(ts(10, 2), 1L, 500L, 1L),
        SpanStat(ts(10, 1), 2L, 200L, 0L))
      q.processAllAvailable()
      assert(spark.table("tail_verdicts").count() === 0L, "no verdict before quiet period")
      // advance the watermark far past both traces' quiet windows
      mem.addData(SpanStat(ts(10, 30), 99L, 1L, 0L))
      q.processAllAvailable()
      mem.addData(SpanStat(ts(10, 40), 99L, 1L, 0L))
      q.processAllAvailable()
      val v = spark.table("tail_verdicts")
        .collect().map(r => r.getAs[Long]("key") ->
          ((r.getAs[Long]("keepSlow"), r.getAs[Long]("keepDeep"), r.getAs[Long]("keep")))).toMap
      assert(v(1L) === ((1L, 1L, 1L)), "slow+deep trace must be kept")
      assert(v(2L)._1 === 0L && v(2L)._2 === 0L, "fast shallow trace keeps only by sample")
      // exactly one verdict per completed trace
      assert(spark.table("tail_verdicts").groupBy("key").count()
        .where(col("count") > 1).count() === 0L)
    } finally q.stop()
  }

  test("streaming duration buckets merge to the batch sketch; windowed KS flags the shifted name") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SpanRow]
    val q = SketchStream.durationBuckets(mem.toDF(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("dur_buckets").outputMode("update").start()
    try {
      // hour 10, name "api": durations in buckets 3 (8-15ms) and 6 (64-127ms);
      // name "db": all bucket 3. Split across micro-batches so sum-merge
      // is exercised.
      mem.addData(SpanRow(ts(10, 1), "api", 10L), SpanRow(ts(10, 2), "api", 100L),
        SpanRow(ts(10, 3), "db", 9L))
      q.processAllAvailable()
      mem.addData(SpanRow(ts(10, 4), "api", 12L), SpanRow(ts(10, 5), "db", 11L))
      // hour 11: "api" shifts wholly into bucket 6 (KS = max CDF gap);
      // "db" keeps its hour-10 shape (KS = 0)
      mem.addData(SpanRow(ts(11, 1), "api", 80L), SpanRow(ts(11, 2), "api", 90L),
        SpanRow(ts(11, 3), "db", 8L), SpanRow(ts(11, 4), "db", 13L))
      q.processAllAvailable()

      // update mode re-emits growing cells: final value = max per cell
      val streamed = spark.table("dur_buckets")
        .groupBy("win_start", "name", "bucket").agg(max("n").as("n"))
      val batchInput = Seq(
        (ts(10, 1), "api", 10L), (ts(10, 2), "api", 100L), (ts(10, 3), "db", 9L),
        (ts(10, 4), "api", 12L), (ts(10, 5), "db", 11L),
        (ts(11, 1), "api", 80L), (ts(11, 2), "api", 90L),
        (ts(11, 3), "db", 8L), (ts(11, 4), "db", 13L))
        .toDF("end_ts", "name", "duration_ms")
      val batch = batchInput
        .groupBy(window(col("end_ts"), "1 hour"), col("name"),
          (length(bin(col("duration_ms"))).cast("long") - 1L).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("name"), col("bucket"), col("n"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed bucket sketch must equal the batch build")

      // downstream KS on the emitted (closed-window) sketch
      val ks = SketchStream.ksBetweenWindows(streamed)
        .collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("ks_e4")).toMap
      // api hour 10: CDF at bucket 3 = 2/3 (6666 e4); hour 11: 0 until
      // bucket 6 → max gap 6666. db: identical 100%-bucket-3 shape → 0.
      assert(ks("api") === 6666L, s"expected api KS 6666 e4, got ${ks("api")}")
      assert(ks("db") === 0L, s"expected db KS 0, got ${ks("db")}")
    } finally q.stop()
  }

  test("streaming burn rate emits integer e6 ratios and budget flags per hour") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = SketchStream.burnRate(mem.toDF(), sloRatioE6 = 250000L, watermark = "5 minutes")
      .writeStream.format("memory").queryName("burn").outputMode("update").start()
    try {
      // hour 10: 3 errors / 4 events = 750000 e6 → over budget
      mem.addData(Ev(ts(10, 1), 1, "error", 1.0), Ev(ts(10, 2), 2, "error", 1.0),
        Ev(ts(10, 3), 3, "error", 1.0), Ev(ts(10, 4), 4, "view", 1.0))
      // hour 11: 1 error / 10 events = 100000 e6 → under budget
      mem.addData(Ev(ts(11, 1), 1, "error", 1.0) +:
        (2 to 10).map(m => Ev(ts(11, m), m.toLong, "view", 1.0)): _*)
      q.processAllAvailable()
      // update mode re-emits a window as it grows; the FINAL emission
      // is the one with the largest (monotone) total — ratio itself is
      // not monotone, so a column-wise max would read a stale row
      val rows = spark.table("burn")
        .groupBy("hour").agg(max_by(
          struct(col("total"), col("errors"), col("ratio_e6"), col("over_budget")),
          col("total")).as("s"))
        .collect().map(r => r.getTimestamp(0).toString -> {
          val s = r.getStruct(1)
          (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
        }).toMap
      assert(rows("2024-01-01 10:00:00.0") === ((4L, 3L, 750000L, 1L)))
      assert(rows("2024-01-01 11:00:00.0") === ((10L, 1L, 100000L, 0L)))
    } finally q.stop()
  }
}
