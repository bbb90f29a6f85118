package graft

import java.sql.Timestamp

import graft.streaming.AsofStream
import graft.streaming.AsofStream.AsofEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized equivalence pin for the streaming as-of join: for random
  * measure/probe sets delivered in random batch splits and random
  * intra-batch arrival order, AsofStream must answer every probe with
  * EXACTLY the reference answer — the (t, id)-maximal measure
  * at-or-before the probe's time. This is the property the
  * carry + pending-buffer design exists to guarantee; the hand cases in
  * AsofStreamSpec pin specific orderings, this pins the space.
  *
  * Batch cuts land only at strict timestamp increases of the merged
  * stream — Spark's stateful late filter drops rows AT the watermark
  * (equality included, the semantic TransitionPropSpec measured), so a
  * cut between equal timestamps would legitimately lose events and the
  * comparison would test the late filter, not the operator.
  */
class AsofPropSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime

  // 10 measures + 8 probes over 2 keys on a minute grid
  private val setGen = for {
    ms <- Gen.listOfN(10, for {
      k <- Gen.chooseNum(1L, 2L); m <- Gen.chooseNum(0, 30)
      v <- Gen.chooseNum(1, 99)
    } yield (k, m, v.toDouble))
    ps <- Gen.listOfN(8, for {
      k <- Gen.chooseNum(1L, 2L); m <- Gen.chooseNum(0, 30)
    } yield (k, m))
  } yield (ms, ps)

  test("streaming as-of == (t,id)-maximal at-or-before reference, any split/order") {
    val cutsGen = Gen.listOfN(2, Gen.chooseNum(1, 17))
    val seedGen = Gen.chooseNum(0L, Long.MaxValue)
    val prop = Prop.forAll(setGen, cutsGen, seedGen) { case ((ms, ps), cuts, sd) =>
      val measures = ms.zipWithIndex.map { case ((k, m, v), i) =>
        AsofEvent(new Timestamp(base + m * 60000L), k, 0, i.toLong, v)
      }
      val probes = ps.zipWithIndex.map { case ((k, m), i) =>
        AsofEvent(new Timestamp(base + m * 60000L), k, 1, 100L + i, 0.0)
      }
      val all = (measures ++ probes).sortBy(e => (e.ts.getTime, e.id))
      val n = all.size
      def strictCut(c: Int): Int = {
        var i = c
        while (i < n && i > 0 && all(i).ts.getTime == all(i - 1).ts.getTime) i += 1
        i
      }
      val rnd = new scala.util.Random(sd)
      val batches = (Seq(0) ++ cuts.map(strictCut) ++ Seq(n)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => rnd.shuffle(all.slice(a, b)) }
        .filter(_.nonEmpty).toList
      // reference: per probe, the (t, id)-maximal measure at-or-before
      val expect = probes.map { p =>
        val best = measures.filter(m => m.key == p.key && m.ts.getTime <= p.ts.getTime)
          .sortBy(m => (m.ts.getTime, m.id)).lastOption
        (p.key, p.id, p.ts.getTime, best.map(_.id), best.map(_.value))
      }.toSet
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[AsofEvent]
      val name = s"asof_prop_${AsofPropSpec.runCounter.incrementAndGet()}"
      val q = AsofStream.asof(
          mem.toDS().withWatermark("ts", "0 seconds").as[AsofEvent])
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        mem.addData(AsofEvent(new Timestamp(base + 86400000L), 999L, 0, 9999L, 0.0))
        q.processAllAvailable()
        val streamed = spark.table(name).where(col("key") =!= 999L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
        streamed == expect
      } finally q.stop()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}

object AsofPropSpec {
  val runCounter = new java.util.concurrent.atomic.AtomicLong(0)
}
