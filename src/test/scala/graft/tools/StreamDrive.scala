package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual driver: exercise LogStatsStream through the real readStream
  * surface (file source → watermarked agg → memory sink).
  * Run: sbt "Test/runMain graft.tools.StreamDrive"
  */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val static = graft.Tables.df(spark, "/root/testdata/sf0.001", "events")
    val dir = java.nio.file.Files.createTempDirectory("streamin").toString
    static.limit(500).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(static.schema).parquet(dir)
    val q = graft.streaming.LogStatsStream.logStats(stream)
      .writeStream.format("memory").queryName("ls").outputMode("update").start()
    q.processAllAvailable()
    val out = spark.table("ls")
    println("STREAM_ROWS=" + out.count())
    out.orderBy(desc("count")).show(5, truncate = false)
    q.stop()
    spark.stop()
  }
}
