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
}
