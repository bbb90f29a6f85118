package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** The cluster-scale layout story (PLANS.md): telemetry views are
  * written date-partitioned, so time-scoped queries prune whole
  * partitions before any IO. This spec materializes the log view with
  * partitionBy and asserts the pruning actually happens.
  */
class PartitionedLayoutSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("date-partitioned log_entries prunes partitions on time filters") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val lk = new Lakehouse(spark, sfDir)
    lk.logEntries
      .withColumn("date", to_date(timestamp_millis(col("time_ms"))))
      .write.mode("overwrite").partitionBy("date").parquet(out)

    val back = spark.read.parquet(out)
    val scoped = back.where(col("date") === "2024-01-05")
    val n = scoped.count()
    val allDates = back.select(countDistinct("date")).head().getLong(0)
    assert(allDates > 10, s"expected many date partitions, got $allDates")

    val scans = collectWithSubqueries(scoped.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // partition pruning: the scan reads exactly one of the many partitions
    val selected = scans.head.relation.location.listFiles(
      scans.head.partitionFilters, scans.head.dataFilters)
    assert(selected.size === 1, s"expected 1 pruned partition, got ${selected.size}")
    assert(n > 0)
  }

  test("ranged query over an updateByDay lake prunes to the ranged days' FILES") {
    // THE 100 TB read path, end-to-end: a begin/end time range on a
    // materialized day-partitioned view must turn into a partition
    // filter (TimeRangeRewrite's derived date predicate) so the scan
    // lists/opens only the ranged days' files — not merely row-group
    // pruning inside every file of every day.
    val out = java.nio.file.Files.createTempDirectory("graft-rangeprune").toString
    // the assertion (2 of ~30 day dirs listed) is scale-invariant — day
    // count doesn't grow with SF — so use the 10x generated lake when a
    // local GenLake run has produced one, the driver testdata otherwise
    val lake = if (new java.io.File("target/sf1/events.parquet").exists()) "target/sf1"
      else sfDir
    val lk = new Lakehouse(spark, lake)
    graft.operators.Materialize.updateByDay(spark, lk.logStats, out)
    spark.read.parquet(out).createOrReplaceTempView("log_stats_lake")
    val begin = java.time.Instant.parse("2024-01-05T00:00:00Z").toEpochMilli * 1000L
    val end = java.time.Instant.parse("2024-01-07T00:00:00Z").toEpochMilli * 1000L // 2 days
    // count day partitions BEFORE arming the range: once the conf range
    // is live, this probe query would itself be scoped to the 2 days
    val allDays = spark.read.parquet(out).select(countDistinct("date")).head().getLong(0)
    assert(allDays >= 29, s"expected a month of day partitions, got $allDays")
    try {
      spark.conf.set("spark.graft.queryRange.column", "time_bin_ms")
      spark.conf.set("spark.graft.queryRange.columnUnit", "millis")
      spark.conf.set("spark.graft.queryRange.beginMicros", begin.toString)
      spark.conf.set("spark.graft.queryRange.endMicros", end.toString)
      val df = spark.sql("SELECT sum(count) AS n FROM log_stats_lake")
      val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      val selected = scans.head.relation.location.listFiles(
        scans.head.partitionFilters, scans.head.dataFilters)
      assert(selected.size === 2,
        s"expected the 2 ranged day partitions of $allDays, got ${selected.size}")
      // and the ranged answer equals the explicit-filter answer
      val n = df.head().getLong(0)
      spark.conf.unset("spark.graft.queryRange.beginMicros")
      spark.conf.unset("spark.graft.queryRange.endMicros")
      val expected = spark.read.parquet(out)
        .where(col("time_bin_ms") >= begin / 1000L && col("time_bin_ms") < end / 1000L)
        .agg(sum("count")).head().getLong(0)
      assert(n === expected && n > 0)
    } finally {
      Seq("spark.graft.queryRange.beginMicros", "spark.graft.queryRange.endMicros",
        "spark.graft.queryRange.column", "spark.graft.queryRange.columnUnit")
        .foreach(spark.conf.unset)
      spark.catalog.dropTempView("log_stats_lake")
    }
  }
}
