package graft

import graft.plans.{BandJoinExec, BandJoinNative}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** The native sliding-merge band join must agree with the bucketed
  * composition ([[graft.operators.BandJoin]]) and a brute-force
  * reference, and must plan as a single merge (no explode, no
  * post-filter of band edges).
  */
class BandJoinNativeSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("emits exactly the in-band pairs, inclusive boundaries") {
    val l = Seq((1L, 10L, 100L), (1L, 11L, 200L), (2L, 20L, 100L)).toDF("k", "lid", "lt")
    val r = Seq((1L, 90L, 50L), (1L, 91L, 150L), (1L, 92L, 251L), (2L, 93L, 100L))
      .toDF("k", "rid", "rt")
    val out = BandJoinNative.join(l, r, Seq("k"), "lt", "rt", width = 50L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // lid 10 (t=100): rids at 50 (gap 50 ✓), 150 (gap 50 ✓)
    // lid 11 (t=200): rid 91 at 150 (gap 50 ✓), rid 92 at 251 (gap 51 ✗)
    // lid 20 (k=2, t=100): rid 93 (gap 0 ✓)
    assert(out === Set((10L, 90L), (10L, 91L), (11L, 91L), (20L, 93L)))
  }

  test("agrees with the bucketed composition on events data") {
    val e = Tables.df(spark, sfDir, "events")
    val errs = e.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("t"))
    val purch = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), unix_millis(col("ts")).as("pt"))
    val native = BandJoinNative.join(errs, purch, Seq("user_id"), "t", "pt",
        width = 1800000L)
      .select(col("event_id").as("err_id"), col("pid").as("pur_id"))
    val composed = graft.operators.BandJoin.within(
        errs.select(col("user_id"), col("event_id"), col("t")),
        purch.select(col("user_id"), col("pid"), col("pt")),
        "user_id", col("t"), col("pt"), widthMs = 1800000L)
      .select(col("l_event_id").as("err_id"), col("r_pid").as("pur_id"))
    assert(native.count() > 0)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "native and bucketed band join disagree")
  }

  test("matches brute force on randomized inputs") {
    val rnd = new scala.util.Random(13)
    val lRows = Seq.tabulate(300)(i => (rnd.nextInt(6).toLong, i.toLong, rnd.nextInt(500).toLong))
    val rRows = Seq.tabulate(300)(i => (rnd.nextInt(6).toLong, (1000 + i).toLong, rnd.nextInt(500).toLong))
    val out = BandJoinNative.join(
        lRows.toDF("k", "lid", "lt"), rRows.toDF("k", "rid", "rt"),
        Seq("k"), "lt", "rt", width = 40L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val expected = (for {
      (lk, lid, lt) <- lRows
      (rk, rid, rt) <- rRows
      if lk == rk && math.abs(lt - rt) <= 40L
    } yield (lid, rid)).toSet
    assert(out === expected)
  }

  test("empty sides yield no pairs (inner-join semantics)") {
    val l = Seq((1L, 10L, 100L)).toDF("k", "lid", "lt")
    val r = Seq((1L, 90L, 120L)).toDF("k", "rid", "rt")
    assert(BandJoinNative.join(l, r.where(lit(false)), Seq("k"), "lt", "rt", 50L).count() === 0)
    assert(BandJoinNative.join(l.where(lit(false)), r, Seq("k"), "lt", "rt", 50L).count() === 0)
  }

  test("hot key (90% of rows) stays correct — skew is a latency tail, not a failure") {
    val rnd = new scala.util.Random(17)
    def key(i: Int): Long = if (i % 10 == 0) rnd.nextInt(5).toLong + 10L else 1L
    val lRows = Seq.tabulate(500)(i => (key(i), i.toLong, rnd.nextInt(300).toLong))
    val rRows = Seq.tabulate(500)(i => (key(i), (1000 + i).toLong, rnd.nextInt(300).toLong))
    val out = BandJoinNative.join(
        lRows.toDF("k", "lid", "lt"), rRows.toDF("k", "rid", "rt"),
        Seq("k"), "lt", "rt", width = 25L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val expected = (for {
      (lk, lid, lt) <- lRows; (rk, rid, rt) <- rRows
      if lk == rk && math.abs(lt - rt) <= 25L
    } yield (lid, rid)).toSet
    assert(out === expected)
    assert(out.size > 10000, s"hot key should produce a dense band, got ${out.size}")
  }

  test("plans as a single merge exec over co-partitioned children") {
    val l = Seq((1L, 10L, 100L)).toDF("k", "lid", "lt")
    val r = Seq((1L, 90L, 120L)).toDF("k", "rid", "rt")
    val df = BandJoinNative.join(l, r, Seq("k"), "lt", "rt", width = 50L)
    df.collect()
    val execs = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: BandJoinExec => e
    }
    assert(execs.size === 1)
  }
}
