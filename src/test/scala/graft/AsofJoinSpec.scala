package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 10L, 100L), // before any right row
    (1L, 11L, 200L), // exactly at a right row (inclusive)
    (1L, 12L, 250L), // between right rows
    (2L, 20L, 500L)  // key with no right rows at all
  ).toDF("k", "lid", "lt")

  private val right = Seq(
    (1L, 90L, 200L, 7.0),
    (1L, 91L, 200L, 8.0), // same time: larger seq wins
    (1L, 92L, 240L, 9.0)
  ).toDF("k", "rid", "rt", "v")

  private def run() =
    AsofJoin.asofBackward(left, right, "k", col("lt"), col("rt"),
        Seq("v", "rid"), col("lid"), col("rid"))
      .orderBy("k", "lt")
      .collect()
      .map(r => (r.getAs[Long]("lid"),
        Option(r.getAs[java.lang.Double]("v")).map(_.toDouble),
        Option(r.getAs[java.lang.Long]("rid")).map(_.toLong)))

  test("backward as-of: inclusive boundary, carry-forward, null before first") {
    val out = run()
    assert(out(0) === ((10L, None, None)))             // nothing at-or-before t=100
    assert(out(1) === ((11L, Some(8.0), Some(91L))))   // t=200 inclusive, larger rid wins tie
    assert(out(2) === ((12L, Some(9.0), Some(92L))))   // latest at-or-before t=250
    assert(out(3) === ((20L, None, None)))             // key never has right rows
  }

  test("a matched right row with a null field doesn't stitch fields from older rows") {
    val r2 = Seq(
      (1L, 90L, 100L, Some(5.0)),
      (1L, 91L, 200L, Option.empty[Double]) // newer matched row, null value
    ).toDF("k", "rid", "rt", "v")
    val out = AsofJoin.asofBackward(
        left.where($"lid" === 12L), r2, "k", col("lt"), col("rt"),
        Seq("v", "rid"), col("lid"), col("rid"))
      .head()
    // true match at t=250 is rid=91 whose v is null — v must be null,
    // NOT 5.0 from the older rid=90 row
    assert(out.getAs[java.lang.Long]("rid") === 91L)
    assert(out.getAs[java.lang.Double]("v") === null)
  }

  test("matches a brute-force reference on randomized inputs (incl. null fields, ties)") {
    val rnd = new scala.util.Random(42)
    val leftRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(6).toLong, i.toLong, rnd.nextInt(50).toLong))
    val rightRows = Seq.tabulate(200)(i =>
      (rnd.nextInt(6).toLong, (1000 + i).toLong, rnd.nextInt(50).toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble())))
    val l = leftRows.toDF("k", "lid", "lt")
    val r = rightRows.toDF("k", "rid", "rt", "v")
    val got = AsofJoin.asofBackward(l, r, "k", col("lt"), col("rt"),
        Seq("v", "rid"), col("lid"), col("rid"))
      .collect()
      .map(row => row.getAs[Long]("lid") ->
        (Option(row.getAs[java.lang.Double]("v")).map(_.toDouble),
          Option(row.getAs[java.lang.Long]("rid")).map(_.toLong)))
      .toMap
    // brute force: per left row, the max-(rt, rid) right row with rt <= lt
    leftRows.foreach { case (k, lid, lt) =>
      val want = rightRows.filter(rr => rr._1 == k && rr._3 <= lt)
        .sortBy(rr => (rr._3, rr._2)).lastOption
      assert(got(lid) === ((want.flatMap(_._4), want.map(_._2))),
        s"lid=$lid k=$k lt=$lt")
    }
    assert(got.size === leftRows.size)
  }

  test("one shuffle on the key, no join operator in the plan") {
    val plan = AsofJoin.asofBackward(left, right, "k", col("lt"), col("rt"),
      Seq("v"), col("lid"), col("rid")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan a join")
    assert(plan.contains("Window"))
  }
}
