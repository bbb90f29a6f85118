package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property pins for the round-7 maintenance/sketch layer.
  *
  *  - HLL registers are a MONOID under per-index max: the union's
  *    registers equal the max-merge of the parts' registers for any
  *    split — the algebraic fact m_hll_daily_merge's daily route
  *    relies on (its oracle pins one split cross-engine; this pins
  *    arbitrary splits in-engine).
  *  - The compaction plan PARTITIONS its input: on seeded synthetic
  *    event tables, every block lands in exactly one merge group,
  *    group byte/object sums reconcile with the blocks view, group
  *    time ranges are ordered and disjoint, and each group's id is
  *    exactly the div-target bucket of the bytes before it (the cut
  *    rule, restated over the planner's own output).
  */
class MaintenancePropSpec extends SparkSpec with TmpDirSupport {
  import spark.implicits._

  test("HLL registers: union == max-merge over any split (monoid property)") {
    val ids = Gen.listOfN(120, Gen.chooseNum(0L, 3000L))
    val splitAt = Gen.chooseNum(1, 119)
    val prop = Prop.forAll(ids, splitAt) { (xs, at) =>
      val (a, b) = xs.splitAt(at)
      def regs(s: Seq[Long]) = graft.operators.Hll
        .registers(s.toDF("id").withColumn("k", lit(1)), Seq("k"), col("id"))
        .collect().map(r => r.getAs[Int]("idx") -> r.getAs[Int]("mrho")).toMap
      val union = regs(xs)
      val merged = (regs(a).toSeq ++ regs(b).toSeq)
        .groupBy(_._1).map { case (i, vs) => i -> vs.map(_._2).max }
      union == merged
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }

  test("compaction plan partitions the blocks view exactly; greedy cut rule holds") {
    // synthetic lake: seeded events over a handful of streams/minutes
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val minute = rnd.nextInt(50)
      (i.toLong, new Timestamp(1704067200000L + minute * 60000L + rnd.nextInt(60000)),
        (rnd.nextInt(3) + 1).toLong, Seq("error", "view", "purchase")(rnd.nextInt(3)),
        rnd.nextDouble(), "x" * (1 + rnd.nextInt(30)))
    }
    val dir = tmpDir("compaction_prop")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val blocks = new Lakehouse(spark, dir).blocks.collect()
    val plan = SparkEntry.queries("m_compaction_plan")(spark, dir).collect()

    // every stream's blocks are covered exactly once
    val blocksPerStream = blocks.groupBy(r =>
      (r.getAs[String]("process_id"), r.getAs[String]("stream_tag")))
    val planPerStream = plan.groupBy(r =>
      (r.getAs[String]("process_id"), r.getAs[String]("stream_tag")))
    assert(blocksPerStream.keySet === planPerStream.keySet)
    for ((k, bs) <- blocksPerStream) {
      val groups = planPerStream(k).sortBy(_.getAs[Long]("group_id"))
      assert(groups.map(_.getAs[Long]("n_blocks")).sum === bs.length.toLong,
        s"$k: blocks must partition into groups")
      assert(groups.map(_.getAs[Long]("group_bytes")).sum ===
        bs.map(_.getAs[Long]("payload_bytes")).sum, s"$k: byte totals reconcile")
      assert(groups.map(_.getAs[Long]("group_objects")).sum ===
        bs.map(_.getAs[Long]("nb_objects")).sum, s"$k: object totals reconcile")
      // group time ranges are disjoint and ordered (left-to-right cuts)
      val spans = groups.map(g =>
        (g.getAs[Long]("first_block_ms"), g.getAs[Long]("last_block_ms")))
      assert(spans.forall { case (f, l) => f <= l })
      assert(spans.sliding(2).forall {
        case Array((_, l1), (f2, _)) => l1 < f2
        case _ => true
      }, s"$k: group time ranges must be ordered and disjoint")
      // cut rule: group ids are the div-target buckets of the running
      // byte total, so each group's id equals (bytes before it) div 64
      val cum = groups.scanLeft(0L)(_ + _.getAs[Long]("group_bytes"))
      groups.zip(cum).foreach { case (g, before) =>
        assert(g.getAs[Long]("group_id") === before / 64L,
          s"$k: group id must be the div-target bucket of prior bytes")
      }
    }
  }
}
