package graft

import org.apache.spark.sql.functions._

class TimeRangeRewriteSpec extends SparkSpec with TmpDirSupport {

  test("marker cache invalidates when the marker file changes or disappears") {
    import graft.plans.TimeRangeRewrite
    import org.apache.spark.sql.catalyst.plans.logical.LeafNode
    val dir = tmpDir("trr_marker")
    spark.sql(
      "select timestamp'2024-01-02 03:04:05' as ts, date'2024-01-02' as date, 1 as v")
      .write.mode("overwrite").parquet(dir)
    def leaf: LeafNode = spark.read.parquet(dir)
      .queryExecution.analyzed.collectLeaves().head.asInstanceOf[LeafNode]
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir,
      graft.operators.Materialize.DayPartitionMarker)
    def writeMarker(timeCol: String, mtime: Long): Unit = {
      val os = fs.create(marker, true)
      try os.write(s"timeColumn=$timeCol\ndateColumn=date\n".getBytes("UTF-8"))
      finally os.close()
      // pin mtime explicitly: two writes within the same FS timestamp
      // granularity would otherwise be indistinguishable
      fs.setTimes(marker, mtime, -1)
    }
    writeMarker("ts", 1000000L)
    assert(TimeRangeRewrite.markerAssertsDerivation(spark, leaf, "ts"))
    // lake re-materialized with a DIFFERENT source time column: the
    // stale cached 'ts' must not keep qualifying the scan (ADVICE r10)
    writeMarker("other_ts", 2000000L)
    assert(!TimeRangeRewrite.markerAssertsDerivation(spark, leaf, "ts"))
    assert(TimeRangeRewrite.markerAssertsDerivation(spark, leaf, "other_ts"))
    // marker deleted (path reused by a non-materializer table): no injection
    fs.delete(marker, false)
    assert(!TimeRangeRewrite.markerAssertsDerivation(spark, leaf, "ts"))
    assert(!TimeRangeRewrite.markerAssertsDerivation(spark, leaf, "other_ts"))
    // and a fresh marker re-qualifies (negative results are never cached)
    writeMarker("ts", 3000000L)
    assert(TimeRangeRewrite.markerAssertsDerivation(spark, leaf, "ts"))
  }

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
