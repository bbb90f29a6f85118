package graft

import graft.operators.BandJoin
import org.apache.spark.sql.functions._

class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches brute force on randomized inputs, including band edges") {
    val rnd = new scala.util.Random(7)
    val ls = Seq.tabulate(150)(i => (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(1000).toLong))
    val rs = Seq.tabulate(150)(i => (rnd.nextInt(4).toLong, (500 + i).toLong, rnd.nextInt(1000).toLong))
    val got = BandJoin.within(
        ls.toDF("k", "lid", "t"), rs.toDF("k", "rid", "t"),
        "k", col("t"), col("t"), widthMs = 100L)
      .select("l_lid", "r_rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (lk, lid, lt) <- ls
      (rk, rid, rt) <- rs
      if lk == rk && math.abs(lt - rt) <= 100L
    } yield (lid, rid)).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("plans a hash join on (key, bin), not a nested loop") {
    val l = Seq((1L, 1L, 10L)).toDF("k", "lid", "t")
    val r = Seq((1L, 2L, 20L)).toDF("k", "rid", "t")
    val plan = BandJoin.within(l, r, "k", col("t"), col("t"), 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"band join must not nested-loop:\n$plan")
  }
}
