package graft

import java.sql.Timestamp

import graft.streaming.RateStream
import graft.streaming.RateStream.CounterSample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Streaming reset-aware increments (M101's live leg): hand cases for
  * restart semantics plus the randomized batch/stream equivalence
  * against the m_rate_resets lag-window derivation.
  */
class RateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime

  private def ts(minute: Int): Timestamp = new Timestamp(base + minute * 60000L)

  private def drive(batches: Seq[Seq[CounterSample]]): Seq[(Long, Long, Long, Boolean)] = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CounterSample]
    val name = s"rate_${RateStreamSpec.runCounter.incrementAndGet()}"
    val q = RateStream.increments(
        mem.toDS().withWatermark("ts", "1 minute").as[CounterSample])
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(CounterSample(ts(2000), 999L, 0L, 9999L))
      q.processAllAvailable()
      spark.table(name).where(col("key") =!= 999L)
        .orderBy("key", "tMs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    } finally q.stop()
  }

  test("monotone steps emit deltas; a drop emits the new value flagged as reset") {
    val out = drive(Seq(Seq(
      CounterSample(ts(0), 1L, 100L, 1L), CounterSample(ts(1), 1L, 250L, 2L),
      CounterSample(ts(2), 1L, 30L, 3L), // restart: counts from zero
      CounterSample(ts(3), 1L, 90L, 4L))))
    assert(out === Seq(
      (1L, ts(1).getTime, 150L, false),
      (1L, ts(2).getTime, 30L, true),
      (1L, ts(3).getTime, 60L, false)))
  }

  test("randomized: streaming increments == batch lag derivation, any split/order") {
    val samplesGen = for {
      vs <- Gen.listOfN(20, for {
        k <- Gen.chooseNum(1L, 2L); v <- Gen.chooseNum(0L, 500L)
      } yield (k, v))
    } yield vs.zipWithIndex.map { case ((k, v), i) =>
      CounterSample(new Timestamp(base + i * 60000L), k, v, i.toLong)
    }
    val cutsGen = Gen.listOfN(2, Gen.chooseNum(1, 19))
    val seedGen = Gen.chooseNum(0L, Long.MaxValue)
    val prop = Prop.forAll(samplesGen, cutsGen, seedGen) { (evs, cuts, sd) =>
      val rnd = new scala.util.Random(sd)
      val batches = (Seq(0) ++ cuts ++ Seq(20)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => rnd.shuffle(evs.slice(a, b)) }
        .filter(_.nonEmpty).toList
      val w = Window.partitionBy("key").orderBy("ts", "id")
      val expect = evs.toDF()
        .withColumn("prev", lag("vE4", 1).over(w))
        .where(col("prev").isNotNull)
        .select(col("key"), unix_millis(col("ts")),
          when(col("vE4") >= col("prev"), col("vE4") - col("prev")).otherwise(col("vE4")),
          col("vE4") < col("prev"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[CounterSample]
      val name = s"rate_prop_${RateStreamSpec.runCounter.incrementAndGet()}"
      val q = RateStream.increments(
          mem.toDS().withWatermark("ts", "0 seconds").as[CounterSample])
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        mem.addData(CounterSample(new Timestamp(base + 86400000L), 999L, 0L, 9999L))
        q.processAllAvailable()
        val streamed = spark.table(name).where(col("key") =!= 999L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
        streamed == expect
      } finally q.stop()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}

object RateStreamSpec {
  val runCounter = new java.util.concurrent.atomic.AtomicLong(0)
}
