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
    // span assembly through the same file-source surface
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val evs = stream.select(col("user_id").as("key"), col("event_id").as("eventId"),
      col("event_type").as("name"), graft.queries.epochMs(col("ts")).as("tMs"),
      col("event_type").isin("signup", "view").as("isBegin"))
      .as[graft.streaming.SpanStream.SpanEvent]
    val q2 = graft.streaming.SpanStream.assemble(evs)
      .writeStream.format("memory").queryName("spans").outputMode("append").start()
    q2.processAllAvailable()
    println("SPAN_ROWS=" + spark.table("spans").count())
    spark.table("spans").orderBy(desc("durationMs")).show(3, truncate = false)
    q2.stop()
    spark.stop()
  }
}
