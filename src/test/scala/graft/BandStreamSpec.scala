package graft

import java.sql.Timestamp

import graft.streaming.BandStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class ErrEv(ts: Timestamp, uid: Long, err_id: Long)
case class PurEv(pts: Timestamp, puid: Long, pur_id: Long)

class BandStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("streaming band join pairs events within the window, per key") {
    implicit val sc = spark.sqlContext
    val errs = MemoryStream[ErrEv]
    val purs = MemoryStream[PurEv]
    val joined = BandStream.bandJoin(
      errs.toDF(), "ts", "uid", purs.toDF(), "pts", "puid",
      width = "10 minutes", watermark = "5 minutes")
    val q = joined.select("err_id", "pur_id")
      .writeStream.format("memory").queryName("band_stream_test")
      .outputMode("append").start()
    try {
      errs.addData(ErrEv(t(10), 1L, 100L), ErrEv(t(40), 1L, 101L), ErrEv(t(10), 2L, 102L))
      purs.addData(
        PurEv(t(5), 1L, 900L),   // 5 min before err 100 → pair
        PurEv(t(19), 1L, 901L),  // 9 min after err 100 → pair
        PurEv(t(25), 1L, 902L),  // 15 min from both errs → no pair
        PurEv(t(12), 3L, 903L))  // other key → no pair
      q.processAllAvailable()
      val out = spark.table("band_stream_test")
        .as[(Long, Long)].collect().toSet
      assert(out === Set((100L, 900L), (100L, 901L)))
      // a later purchase pairs with the later error only
      purs.addData(PurEv(t(45), 1L, 904L))
      q.processAllAvailable()
      val out2 = spark.table("band_stream_test").as[(Long, Long)].collect().toSet
      assert(out2 === out + ((101L, 904L)))
    } finally q.stop()
  }

  test("streaming sessionization merges gap-adjacent events and closes on watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ErrEv]
    val q = BandStream.sessionize(mem.toDF(), "ts", "uid",
        gap = "5 minutes", watermark = "2 minutes")
      .writeStream.format("memory").queryName("session_stream_test")
      .outputMode("append").start()
    try {
      // uid 1: events at 10:00, 10:03, 10:06 → one session (gaps < 5m);
      // another at 10:20 → second session. uid 2: one lone event.
      mem.addData(ErrEv(t(0), 1L, 1L), ErrEv(t(3), 1L, 2L), ErrEv(t(6), 1L, 3L),
        ErrEv(t(20), 1L, 4L), ErrEv(t(5), 2L, 5L))
      q.processAllAvailable()
      // push the watermark far enough to close every session
      mem.addData(ErrEv(t(59), 9L, 99L))
      q.processAllAvailable()
      mem.addData(ErrEv(t(59, 30), 9L, 98L))
      q.processAllAvailable()
      val out = spark.table("session_stream_test")
        .select("uid", "session_start", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
      assert(out.contains((1L, "2024-01-01 10:00:00.0", 3L)), s"got $out")
      assert(out.contains((1L, "2024-01-01 10:20:00.0", 1L)))
      assert(out.contains((2L, "2024-01-01 10:05:00.0", 1L)))
    } finally q.stop()
  }

  test("matches the batch band join on the same data") {
    implicit val sc = spark.sqlContext
    val errs = MemoryStream[ErrEv]
    val purs = MemoryStream[PurEv]
    val joined = BandStream.bandJoin(
      errs.toDF(), "ts", "uid", purs.toDF(), "pts", "puid",
      width = "10 minutes", watermark = "5 minutes")
    val q = joined.select("err_id", "pur_id")
      .writeStream.format("memory").queryName("band_stream_batch_cmp")
      .outputMode("append").start()
    val errRows = Seq(ErrEv(t(10), 1L, 100L), ErrEv(t(31), 1L, 101L), ErrEv(t(8), 2L, 102L))
    val purRows = Seq(PurEv(t(3), 1L, 900L), PurEv(t(18), 1L, 901L),
      PurEv(t(29), 1L, 902L), PurEv(t(9), 2L, 903L), PurEv(t(59), 2L, 904L))
    try {
      errs.addData(errRows: _*)
      purs.addData(purRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("band_stream_batch_cmp").as[(Long, Long)].collect().toSet
      val batch = graft.plans.BandJoinNative.join(
          errRows.toDF().withColumn("t_ms", unix_millis(col("ts"))),
          purRows.toDF().withColumnRenamed("puid", "uid")
            .withColumn("pt_ms", unix_millis(col("pts"))),
          Seq("uid"), "t_ms", "pt_ms", width = 600000L)
        .select("err_id", "pur_id").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("randomized: streaming band join == native batch exec on random sets") {
    // the randomized leg of the cross-check above: random error/purchase
    // sets (2 keys, 0..59-minute grid) must produce EXACTLY the native
    // batch exec's pairs — pins both the stream's range-condition
    // construction (inclusive bounds, key equality) and the exec's
    // sliding-deque merge against each other
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    implicit val sc = spark.sqlContext
    val errsGen = Gen.listOfN(8, for {
      k <- Gen.chooseNum(1L, 2L); m <- Gen.chooseNum(0, 59)
    } yield (k, m))
    val pursGen = Gen.listOfN(10, for {
      k <- Gen.chooseNum(1L, 2L); m <- Gen.chooseNum(0, 59)
    } yield (k, m))
    var trial = 0
    val prop = Prop.forAll(errsGen, pursGen) { (es, ps) =>
      trial += 1
      val errRows = es.zipWithIndex.map { case ((k, m), i) => ErrEv(t(m), k, 100L + i) }
      val purRows = ps.zipWithIndex.map { case ((k, m), i) => PurEv(t(m), k, 900L + i) }
      val errs = MemoryStream[ErrEv]
      val purs = MemoryStream[PurEv]
      val q = BandStream.bandJoin(
          errs.toDF(), "ts", "uid", purs.toDF(), "pts", "puid",
          width = "10 minutes", watermark = "5 minutes")
        .select("err_id", "pur_id")
        .writeStream.format("memory").queryName(s"band_prop_$trial")
        .outputMode("append").start()
      try {
        errs.addData(errRows: _*); purs.addData(purRows: _*)
        q.processAllAvailable()
        // close both watermarks so every in-band pair has emitted
        errs.addData(ErrEv(Timestamp.valueOf("2024-01-02 10:00:00"), 99L, 9998L))
        purs.addData(PurEv(Timestamp.valueOf("2024-01-02 10:00:00"), 99L, 9999L))
        q.processAllAvailable()
        val streamed = spark.table(s"band_prop_$trial")
          .where(col("err_id") =!= 9998L && col("pur_id") =!= 9999L)
          .as[(Long, Long)].collect().toSet
        val batch = graft.plans.BandJoinNative.join(
            errRows.toDF().withColumn("t_ms", unix_millis(col("ts"))),
            purRows.toDF().withColumnRenamed("puid", "uid")
              .withColumn("pt_ms", unix_millis(col("pts"))),
            Seq("uid"), "t_ms", "pt_ms", width = 600000L)
          .select("err_id", "pur_id").as[(Long, Long)].collect().toSet
        streamed == batch
      } finally q.stop()
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}
