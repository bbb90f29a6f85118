package graft

import org.apache.spark.sql.SparkSession

/** Print one registered query's AQE-finalized physical plan — the
  * plan-shape iteration tool (MicroBench times it, StageProfile
  * attributes it, this one shows it).
  * Usage: runMain graft.ExplainOne <sfDir> <query>
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.allQueries.find(_.name == args(1))
      .getOrElse(sys.error(s"unknown query: ${args(1)}"))
    val df = q.fn(spark, args(0))
    df.count() // materialize so AQE finalizes the stages the plan shows
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
