package graft

/** The scalar-threshold queries (Q11/Q15/Q20 shapes) are built so the
  * threshold branch derives from the SAME per-key aggregation as the
  * main branch — AQE must then reuse the shuffle stage, scanning the
  * fact table once. A regression here (e.g. an extra isnotnull on one
  * branch only) silently doubles the fact-scan cost at 100 TB.
  */
class StageReuseSpec extends SparkSpec {

  private val qs = SparkEntry.allQueries.map(q => q.name -> q).toMap

  Seq("q11_important_stock", "q15_top_supplier", "q20_potential_promotion").foreach { n =>
    test(s"$n reuses the shared aggregation stage (one fact scan)") {
      val df = qs(n).fn(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedQueryStage")) +
        plan.linesIterator.count(_.contains("ReusedExchange"))
      assert(reused >= 1, s"no reused stage in $n:\n$plan")
    }
  }
}
