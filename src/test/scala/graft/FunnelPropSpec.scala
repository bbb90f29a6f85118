package graft

import java.sql.Timestamp

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Batch/stream equivalence pin for the funnel layer (M67's two legs):
  * for random event sets delivered in random batch splits and random
  * WITHIN-batch arrival order, the streaming operator's step facts
  * must equal the batch chained-min-aggregate derivation (m_funnel's
  * s1/s2/s3 shape) over the same rows — the in-event-time-order "first
  * qualifying event IS the min qualifying time" argument, made
  * mechanical.
  */
class FunnelPropSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
  private val stepTypes = Seq("signup", "view", "purchase")
  private val windowMs = 10 * 60000L // 10 min: tight enough to stall some users

  // (user, minuteOffset, type); funnel types overweighted so chains form
  private val eventsGen = Gen.listOfN(24, for {
    u <- Gen.chooseNum(1L, 3L)
    m <- Gen.chooseNum(0, 40)
    t <- Gen.oneOf("signup", "view", "purchase", "click")
  } yield (u, m, t))

  /** m_funnel's derivation generalized to emit (user, step, t). */
  private def batchSteps(evs: Seq[UserEvent]): Set[(Long, Int, Long)] = {
    val e = evs.toDF().select(col("userId"), col("eventType"),
      unix_millis(col("ts")).as("t"))
    var cur = e.where(col("eventType") === stepTypes.head)
      .groupBy("userId").agg(min("t").as("tPrev"))
    val out = Set.newBuilder[(Long, Int, Long)]
    out ++= cur.collect().map(r => (r.getLong(0), 1, r.getLong(1)))
    for (k <- 1 until stepTypes.length) {
      cur = e.where(col("eventType") === stepTypes(k))
        .join(cur, "userId")
        .where(col("t") > col("tPrev") && col("t") <= col("tPrev") + windowMs)
        .groupBy("userId").agg(min("t").as("tPrev"))
      out ++= cur.collect().map(r => (r.getLong(0), k + 1, r.getLong(1)))
    }
    out.result()
  }

  test("streaming step facts == batch chained-min funnel, any batch split/arrival order") {
    val splits = Gen.listOfN(2, Gen.chooseNum(1, 23))
    val seed = Gen.chooseNum(0L, Long.MaxValue)
    val prop = Prop.forAll(eventsGen, splits, seed) { (raw, cuts, sd) =>
      val evs = raw.zipWithIndex.map { case ((u, m, t), i) =>
        UserEvent(new Timestamp(base + m * 60000L), u, t, i.toLong)
      }
      // cuts only at strict timestamp increases (same late-filter
      // rationale as TransitionPropSpec: a row AT the watermark drops)
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
      val name = s"funnel_prop_${FunnelPropSpec.runCounter.incrementAndGet()}"
      val q = FunnelStream.steps(
          mem.toDS().withWatermark("ts", "0 seconds").as[UserEvent],
          stepTypes, windowMs)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        mem.addData(UserEvent(new Timestamp(base + 86400000L), 99L, "flush", 9999L))
        q.processAllAvailable()
        val streamed = spark.table(name).where(col("userId") =!= 99L)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
        streamed == batchSteps(evs)
      } finally q.stop()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}

object FunnelPropSpec {
  val runCounter = new java.util.concurrent.atomic.AtomicLong(0)
}
