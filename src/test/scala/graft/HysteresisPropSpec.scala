package graft

import java.sql.Timestamp

import graft.streaming.HysteresisStream
import graft.streaming.HysteresisStream.Sample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Batch/stream equivalence for the hysteresis state machine: the
  * streaming carried-bit fold (HysteresisStream) and the batch
  * carry-forward-window formulation (m_hysteresis_alerts' tag →
  * last-non-null state → lag edges) must emit exactly the same rising
  * edges on random series, for any batch split and intra-batch arrival
  * order — two independent derivations of the Schmitt trigger. Falling
  * edges are checked through the streaming side's own totals (the
  * batch query only surfaces rising pages).
  */
class HysteresisPropSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
  private val hi = 100.0
  private val lo = 50.0

  // 2 series × values that hit below-LO / in-band / above-HI regions
  private val samplesGen: Gen[List[Sample]] = for {
    vs <- Gen.listOfN(24, for {
      k <- Gen.chooseNum(1L, 2L)
      v <- Gen.oneOf(Gen.chooseNum(0, 49), Gen.chooseNum(51, 99), Gen.chooseNum(101, 200))
    } yield (k, v.toDouble))
  } yield vs.zipWithIndex.map { case ((k, v), i) =>
    Sample(new Timestamp(base + i * 60000L), k, v, i.toLong)
  }

  /** Batch edges via the m_hysteresis_alerts window formulation. */
  private def batchRisingEdges(ss: Seq[Sample]): Set[(Long, Long)] = {
    val w = Window.partitionBy("key").orderBy("ts", "id")
    ss.toDF()
      .withColumn("tag",
        when(col("value") > hi, 1L).when(col("value") < lo, 0L).otherwise(lit(null)))
      .withColumn("state", coalesce(
        last("tag", ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), lit(0L)))
      .withColumn("prev_state", coalesce(lag("state", 1).over(w), lit(0L)))
      .where(col("state") === 1 && col("prev_state") === 0)
      .select(col("key"), unix_millis(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("streaming carried-bit fold == batch carry-forward window, any split/order") {
    val cutsGen = Gen.listOfN(2, Gen.chooseNum(1, 23))
    val seedGen = Gen.chooseNum(0L, Long.MaxValue)
    val prop = Prop.forAll(samplesGen, cutsGen, seedGen) { (evs, cuts, sd) =>
      val rnd = new scala.util.Random(sd)
      // timestamps are unique by construction → any cut is strict
      val batches = (Seq(0) ++ cuts ++ Seq(24)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => rnd.shuffle(evs.slice(a, b)) }
        .filter(_.nonEmpty).toList
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Sample]
      val name = s"hyst_prop_${HysteresisPropSpec.runCounter.incrementAndGet()}"
      val q = HysteresisStream.edges(
          mem.toDS().withWatermark("ts", "0 seconds").as[Sample], hi, lo)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        mem.addData(Sample(new Timestamp(base + 86400000L), 999L, 0.0, 9999L))
        q.processAllAvailable()
        val streamed = spark.table(name)
          .where(col("key") =!= 999L && col("firing"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        streamed == batchRisingEdges(evs)
      } finally q.stop()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}

object HysteresisPropSpec {
  val runCounter = new java.util.concurrent.atomic.AtomicLong(0)
}
