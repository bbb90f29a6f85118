package graft

import java.sql.Timestamp

import graft.streaming.TransitionStream
import graft.streaming.TransitionStream.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Batch/stream equivalence pin for the transition layer: for random
  * event sets delivered in random batch splits and random
  * WITHIN-batch order, the streaming operator must emit exactly the
  * transitions the batch lag-window derivation (m_transition_matrix's
  * step table) computes over the same rows. This is the property the
  * watermark buffer + carried-last-state design exists to guarantee —
  * arrival order is noise, event order is the contract.
  */
class TransitionPropSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime

  // (user, minuteOffset, type-id); ids unique per event via index
  private val eventsGen = Gen.listOfN(24, for {
    u <- Gen.chooseNum(1L, 3L)
    m <- Gen.chooseNum(0, 40)
    t <- Gen.oneOf("a", "b", "c")
  } yield (u, m, t))

  private def batchTransitions(evs: Seq[UserEvent]): Set[(Long, String, String, Long)] = {
    val df = evs.toDF()
    val w = Window.partitionBy("userId").orderBy("ts", "id")
    df.withColumn("from", lag("eventType", 1).over(w))
      .where(col("from").isNotNull)
      .select(col("userId"), col("from"), col("eventType"), unix_millis(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
  }

  test("streaming transitions == batch lag derivation, any batch split/arrival order") {
    val splits = Gen.listOfN(2, Gen.chooseNum(1, 23))
    val seed = Gen.chooseNum(0L, Long.MaxValue)
    val prop = Prop.forAll(eventsGen, splits, seed) { (raw, cuts, sd) =>
      // unique ids; timestamps off a fixed base minute grid
      val evs = raw.zipWithIndex.map { case ((u, m, t), i) =>
        UserEvent(new Timestamp(base + m * 60000L), u, t, i.toLong)
      }
      // shuffle WITHIN batches only: events at-or-behind the watermark
      // of a previous batch are legitimately dropped by Spark's late
      // filter (EQUALITY included — measured: a row with ts == the
      // watermark is dropped), so cuts land only at STRICT timestamp
      // increases; the contract under test is batch-split +
      // intra-batch arrival order
      val rnd = new scala.util.Random(sd)
      val sorted = evs.sortBy(e => (e.ts.getTime, e.id))
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
      val mem = MemoryStream[UserEvent]
      val name = s"trans_prop_${TransitionPropSpec.runCounter.incrementAndGet()}"
      val q = TransitionStream.transitions(
          mem.toDS().withWatermark("ts", "0 seconds").as[UserEvent])
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        mem.addData(UserEvent(new Timestamp(base + 86400000L), 99L, "flush", 9999L))
        q.processAllAvailable()
        val streamed = spark.table(name).where(col("userId") =!= 99L)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
        streamed == batchTransitions(evs)
      } finally q.stop()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}

object TransitionPropSpec {
  val runCounter = new java.util.concurrent.atomic.AtomicLong(0)
}
