package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing harness: run named queries N times in one JVM.
  * sbt "Test/runMain graft.tools.MicroBench l_dedup_minhash 3"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) Seq("l_dedup_minhash") else args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        qs(n).fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMES $n: ${times.map(t => f"$t%.2f").mkString(", ")} best=${times.min}%.2f")
    }
    spark.stop()
  }
}
