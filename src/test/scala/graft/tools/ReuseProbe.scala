package graft.tools

import org.apache.spark.sql.SparkSession

/** Runtime check that AQE reuses the shared groupBy exchange (one fact
  * scan) for queries whose scalar threshold derives from the same
  * aggregation. sbt "Test/runMain graft.tools.ReuseProbe q11_important_stock"
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    args(0).split(",").foreach { n =>
      val df = qs(n).fn(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedQueryStage")) +
        plan.linesIterator.count(_.contains("ReusedExchange"))
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      println(s"[reuse] $n reusedStages=$reused scans=$scans")
    }
    spark.stop()
  }
}
