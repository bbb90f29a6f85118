package graft

import org.apache.spark.sql.functions._

class TimeRangeRewriteSpec extends SparkSpec {

  test("session query range is injected into scans and pushed down") {
    val full = Tables.df(spark, sfDir, "events").count()
    // range covering roughly the first half of January 2024 (µs epoch)
    val begin = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    val end = java.time.Instant.parse("2024-01-15T00:00:00Z").toEpochMilli * 1000L
    try {
      spark.conf.set("spark.graft.queryRange.beginMicros", begin.toString)
      spark.conf.set("spark.graft.queryRange.endMicros", end.toString)
      val scoped = Tables.df(spark, sfDir, "events")
      val n = scoped.count()
      assert(n > 0 && n < full, s"expected partial range, got $n of $full")
      // equivalent to an explicit filter on the normalized timestamp
      spark.conf.unset("spark.graft.queryRange.beginMicros")
      spark.conf.unset("spark.graft.queryRange.endMicros")
      val expected = Tables.df(spark, sfDir, "events")
        .where(col("ts") >= lit("2024-01-01") && col("ts") < lit("2024-01-15")).count()
      assert(n === expected)
    } finally {
      spark.conf.unset("spark.graft.queryRange.beginMicros")
      spark.conf.unset("spark.graft.queryRange.endMicros")
    }
  }
}
