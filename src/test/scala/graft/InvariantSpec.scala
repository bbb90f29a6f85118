package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the R5 operators — properties that must
  * hold for EVERY row/group, not just the oracle-compared output:
  * the CMS over-count guarantee corpus-wide, conservation of time
  * under flame folding, exact apportionment, funnel monotonicity,
  * quantile-band ordering. These catch logic regressions the
  * cell-compare could only catch if the corpus happened to exercise
  * them.
  */
class InvariantSpec extends SparkSpec {

  test("CMS estimate >= exact count for EVERY distinct token (the sketch guarantee)") {
    val toks = SparkEntry.queries("l_token_count")(spark, sfDir).sparkSession
      .read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .localCheckpoint()
    val cells = graft.operators.Cms.cells(toks, "tok")
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    val est = graft.operators.Cms.estimate(exact, "tok", cells)
    val viol = est.where(col("cms_est") < col("exact_cnt")).count()
    assert(viol === 0L, "Count-Min must never under-count")
  }

  test("flame folding conserves time: sum of self over paths == sum of root durations") {
    val folded = SparkEntry.queries("m_flame_collapse")(spark, sfDir)
    val selfTotal = folded.agg(sum("self_ms")).head().getLong(0)
    // roots are the paths with no ';' — their inclusive total is the
    // whole forest's wall work, which self times partition exactly
    val rootTotal = folded.where(!col("path").contains(";"))
      .agg(sum("total_ms")).head().getLong(0)
    assert(selfTotal === rootTotal,
      "self times must partition the root-inclusive total exactly")
  }

  test("apportionment is exact: allocations sum to the budget, each within +1 of its floor") {
    val a = SparkEntry.queries("l_token_apportion")(spark, sfDir)
    val rows = a.collect()
    assert(rows.map(r => r.getAs[Long]("allocated")).sum === 100000L)
    assert(rows.forall { r =>
      val d = r.getAs[Long]("allocated") - r.getAs[Long]("floor_alloc")
      d == 0L || d == 1L
    })
  }

  test("funnel is monotone: each step's users <= previous step's") {
    val f = SparkEntry.queries("m_funnel")(spark, sfDir)
      .orderBy("step").collect().map(_.getAs[Long]("users"))
    assert(f.sliding(2).forall(p => p.length < 2 || p(1) <= p(0)))
  }

  test("latency bands are ordered: p50 <= p90 <= p99 per name") {
    val b = SparkEntry.queries("m_latency_bands")(spark, sfDir).collect()
    assert(b.forall { r =>
      val (p50, p90, p99) = (r.getAs[Long]("p50_bin"), r.getAs[Long]("p90_bin"),
        r.getAs[Long]("p99_bin"))
      p50 <= p90 && p90 <= p99
    })
  }

  test("tail sampling keeps every trace exactly once and reasons imply keep") {
    val t = SparkEntry.queries("m_tail_sampling")(spark, sfDir).collect()
    assert(t.map(_.getAs[Long]("user_id")).distinct.length === t.length)
    assert(t.forall { r =>
      val keep = r.getAs[Long]("keep")
      val any = Seq("keep_slow", "keep_deep", "keep_sample")
        .map(r.getAs[Long](_)).max
      keep === any
    })
  }
}
