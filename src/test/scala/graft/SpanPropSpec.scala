package graft

import graft.operators.SpanAssembly
import graft.streaming.SpanStream
import graft.streaming.SpanStream.SpanEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Cross-IMPLEMENTATION equivalence for span assembly: the streaming
  * stack replay (SpanStream, one stack per key in state) and the batch
  * window-function formulation (SpanAssembly.beginEndSpans — running
  * depth + per-(key, depth) sequence matching) must produce identical
  * span tables on any well-formed begin/end sequence, under any batch
  * split with intra-batch arrival shuffled (the streaming operator's
  * delivery contract is ordered batches, order WITHIN a batch free).
  * Two independent derivations agreeing on random inputs is a far
  * stronger pin than either one's hand cases.
  */
class SpanPropSpec extends SparkSpec {
  import spark.implicits._

  /** Well-formed random begin/end sequences for 2 keys: at each step a
    * key either opens a span or (if it has one open) closes the
    * innermost; every event gets a distinct, increasing timestamp.
    */
  private val seqGen: Gen[List[SpanEvent]] = for {
    steps <- Gen.listOfN(26, for {
      k <- Gen.chooseNum(1L, 2L)
      push <- Gen.oneOf(true, false)
      nm <- Gen.oneOf("a", "b")
    } yield (k, push, nm))
  } yield {
    val open = scala.collection.mutable.Map(1L -> 0, 2L -> 0)
    val out = List.newBuilder[SpanEvent]
    steps.zipWithIndex.foreach { case ((k, push, nm), i) =>
      val isBegin = push || open(k) == 0
      open(k) += (if (isBegin) 1 else -1)
      out += SpanEvent(k, i.toLong, nm, 1000L + i * 1000L, isBegin)
    }
    out.result()
  }

  test("streaming stack replay == batch window assembly, any split/arrival order") {
    val cutsGen = Gen.listOfN(2, Gen.chooseNum(1, 25))
    val seedGen = Gen.chooseNum(0L, Long.MaxValue)
    val prop = Prop.forAll(seqGen, cutsGen, seedGen) { (evs, cuts, sd) =>
      val rnd = new scala.util.Random(sd)
      val n = evs.size
      val batches = (Seq(0) ++ cuts ++ Seq(n)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => rnd.shuffle(evs.slice(a, b)) }
        .filter(_.nonEmpty).toList
      val batch = SpanAssembly.beginEndSpans(evs.toDF(), "key", col("tMs"), "eventId",
          "name", col("isBegin"))
        .select(col("key"), col("span_id"), col("name"), col("depth").cast("int"),
          col("begin_ms"), col("end_ms"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getInt(3), r.getLong(4), r.getLong(5))).toSet
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[SpanEvent]
      val name = s"span_prop_${SpanPropSpec.runCounter.incrementAndGet()}"
      val q = SpanStream.assemble(mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val streamed = spark.table(name)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getInt(3), r.getLong(4), r.getLong(5))).toSet
        streamed == batch
      } finally q.stop()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}

object SpanPropSpec {
  val runCounter = new java.util.concurrent.atomic.AtomicLong(0)
}
