package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted plans for named queries (default: headline set).
  * sbt "Test/runMain graft.tools.ExplainAudit q1_agg,q5_multi_join"
  */
object ExplainAudit {
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
    val names =
      if (args.isEmpty) graft.SparkEntry.headlineQueries.map(_.name)
      else args(0).split(",").toSeq
    names.foreach { n =>
      println(s"########## $n ##########")
      qs(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
