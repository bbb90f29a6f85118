package graft

import java.sql.Timestamp

import graft.streaming.ConcurrencyStream
import graft.streaming.ConcurrencyStream.SpanDelta
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Batch/stream equivalence pin for the concurrency timeline (M74's
  * two legs): for random delta sets in random batch splits and random
  * within-batch arrival order, the streaming per-minute rows with the
  * carried open-at-end counter must equal the batch sweep-line
  * derivation (m_concurrency's per-minute net + global prefix sum)
  * over the same rows. This is the property the commutative per-minute
  * cell merge + ordered minute fold exist to guarantee.
  */
class ConcurrencyPropSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime

  // (minuteOffset, secondOffset, ±1); ids unique via index
  private val deltasGen = Gen.listOfN(24, for {
    m <- Gen.chooseNum(0, 12)
    sec <- Gen.chooseNum(0, 59)
    d <- Gen.oneOf(1L, -1L)
  } yield (m, sec, d))

  private def batchRows(ds: Seq[SpanDelta]): Set[(Long, Long, Long, Long)] = {
    val pm = ds.toDF()
      .select((expr("unix_millis(ts) div 60000") * 60000L).as("minuteMs"), col("delta"))
      .groupBy("minuteMs")
      .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("nOpened"),
        sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("nClosed"),
        sum("delta").as("net"))
    val w = Window.orderBy("minuteMs").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pm.withColumn("openAtEnd", sum("net").over(w))
      .select("minuteMs", "nOpened", "nClosed", "openAtEnd")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("streaming minute rows == batch sweep-line, any batch split/arrival order") {
    val splits = Gen.listOfN(2, Gen.chooseNum(1, 23))
    val seed = Gen.chooseNum(0L, Long.MaxValue)
    val prop = Prop.forAllNoShrink(deltasGen, splits, seed) { (raw, cuts, sd) =>
      val ds = raw.zipWithIndex.map { case ((m, sec, d), i) =>
        SpanDelta(new Timestamp(base + m * 60000L + sec * 1000L), d, i.toLong)
      }
      val rnd = new scala.util.Random(sd)
      val sorted = ds.sortBy(e => (e.ts.getTime, e.id))
      def strictCut(c: Int): Int = {
        var i = c
        while (i < 24 && i > 0 && sorted(i).ts.getTime == sorted(i - 1).ts.getTime) i += 1
        i
      }
      val cutsSorted = cuts.map(strictCut).distinct.sorted
      val batches = (Seq(0) ++ cutsSorted ++ Seq(24)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => rnd.shuffle(sorted.slice(a, b)) }
        .filter(_.nonEmpty).toList
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[SpanDelta]
      val name = s"conc_prop_${ConcurrencyPropSpec.runCounter.incrementAndGet()}"
      val q = ConcurrencyStream.minuteRows(
          mem.toDS().withWatermark("ts", "0 seconds").as[SpanDelta])
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        mem.addData(SpanDelta(new Timestamp(base + 86400000L), 1L, 9999L))
        q.processAllAvailable()
        val streamed = spark.table(name)
          .where(col("minuteMs") < base + 86400000L - 60000L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        streamed == batchRows(ds)
      } finally q.stop()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }

  test("two-stage production topology (windowed pre-agg -> global fold) == batch sweep-line") {
    // The scaladoc'd production shape, COMPOSED (round-9 verdict item
    // 6): stage 1 is a streaming windowed aggregation that collapses
    // raw span deltas into per-minute (opened, closed) cells — the
    // volume-bearing, embarrassingly parallel work; stage 2 is
    // ConcurrencyStream.fromCells, the single-key ordered fold, now fed
    // O(elapsed minutes) cells instead of O(spans) deltas. Both stages
    // run as stateful operators of ONE streaming query; the result must
    // equal the batch sweep-line for random inputs/splits/orders.
    val splits = Gen.listOfN(2, Gen.chooseNum(1, 23))
    val seed = Gen.chooseNum(0L, Long.MaxValue)
    val prop = Prop.forAllNoShrink(deltasGen, splits, seed) { (raw, cuts, sd) =>
      val ds = raw.zipWithIndex.map { case ((m, sec, d), i) =>
        SpanDelta(new Timestamp(base + m * 60000L + sec * 1000L), d, i.toLong)
      }
      val rnd = new scala.util.Random(sd)
      val sorted = ds.sortBy(e => (e.ts.getTime, e.id))
      def strictCut(c: Int): Int = {
        var i = c
        while (i < 24 && i > 0 && sorted(i).ts.getTime == sorted(i - 1).ts.getTime) i += 1
        i
      }
      val cutsSorted = cuts.map(strictCut).distinct.sorted
      val batches = (Seq(0) ++ cutsSorted ++ Seq(24)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => rnd.shuffle(sorted.slice(a, b)) }
        .filter(_.nonEmpty).toList
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[SpanDelta]
      val name = s"conc_stage_${ConcurrencyPropSpec.runCounter.incrementAndGet()}"
      val cells = mem.toDS().withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 minute"))
        .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("opened"),
          sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("closed"))
        // window_time (not window.start AS ts): a plain alias of the
        // struct field strips the watermark metadata and the downstream
        // event-time-timeout fold fails analysis; window_time emits
        // window.end - 1µs WITH the event-time tag — still inside the
        // minute, so the fold buckets it to the same minuteMs
        .select(window_time(col("window")).as("ts"), col("opened"), col("closed"))
        .as[ConcurrencyStream.MinuteCell]
      val q = ConcurrencyStream.fromCells(cells)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        // two flush ticks a day apart: the first closes every data
        // minute in stage 1 (cells emitted), the second pushes the
        // watermark past those cells so stage 2's fold emits them too
        mem.addData(SpanDelta(new Timestamp(base + 86400000L), 1L, 9998L))
        q.processAllAvailable()
        mem.addData(SpanDelta(new Timestamp(base + 2 * 86400000L), 1L, 9999L))
        q.processAllAvailable()
        val streamed = spark.table(name)
          .where(col("minuteMs") < base + 86400000L - 60000L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        streamed == batchRows(ds)
      } finally q.stop()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}

object ConcurrencyPropSpec {
  val runCounter = new java.util.concurrent.atomic.AtomicLong(0)
}
