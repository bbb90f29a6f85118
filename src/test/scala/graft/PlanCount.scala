package graft

// scratch: print shuffle/broadcast/cartesian counts per query (used to
// calibrate PlanShapeSpec budgets; not a test)
object PlanCount {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
      f(p)
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case o => o.children
      }
      p.subqueries.foreach(walk(_)(f))
      kids.foreach(walk(_)(f))
    }
    val sfDir = "/root/testdata/sf0.001"
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // finalize AQE
      val p = df.queryExecution.executedPlan
      var sh = 0; var bc = 0; var cp = 0
      walk(p) {
        case _: ShuffleExchangeLike => sh += 1
        case _: BroadcastExchangeLike => bc += 1
        case _: CartesianProductExec => cp += 1
        case _ => ()
      }
      println(s"PLANCOUNT $name shuffles=$sh broadcasts=$bc cartesian=$cp")
    }
    spark.stop()
  }
}
