package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialization of aggregated views into a
  * date-partitioned parquet lake — the Spark analog of the reference's
  * live-ETL partition maintenance (rust/analytics/src/lakehouse/
  * batch_update.rs, merge.rs: per-partition update of materialized
  * view data as new blocks arrive, closed partitions left untouched).
  *
  * The update unit is a DAY partition: on each run, only the lake's
  * newest ("open") day and anything after it is recomputed — the open
  * day may have been written from partial data, exactly the
  * reference's active-partition problem. Earlier days are closed:
  * their files are not rewritten (asserted by spec via file listing),
  * so repeated updates over a growing source do O(new data) work, not
  * O(history). Dynamic partition overwrite makes the day swap atomic
  * per partition.
  *
  * At cluster scale the same code materializes hour/minute partition
  * granularities by swapping the `date` derivation; the source
  * aggregation is partial-agg friendly so each update shuffles only
  * (bin, key) group rows.
  */
object Materialize {

  final case class UpdateStats(daysRecomputed: Long, rowsWritten: Long)

  /** Incrementally materialize `stats` (any frame with an epoch-ms
    * `time_bin_ms` column) into `outDir`, partitioned by derived
    * `date`. Returns what was recomputed.
    */
  def updateByDay(spark: SparkSession, stats: DataFrame, outDir: String): UpdateStats = {
    val withDate = stats.withColumn("date", to_date(timestamp_millis(col("time_bin_ms"))))
    val openDay: Option[java.sql.Date] =
      if (new java.io.File(outDir).exists())
        spark.read.parquet(outDir).agg(max("date")).head().getAs[java.sql.Date](0) match {
          case null => None
          case d => Some(d)
        }
      else None
    val fresh = openDay match {
      case Some(d) => withDate.where(col("date") >= lit(d))
      case None => withDate
    }
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try fresh.write.mode("overwrite").partitionBy("date").parquet(outDir)
    finally prevMode match {
      case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val agg = fresh.agg(countDistinct("date"), count(lit(1))).head()
    UpdateStats(agg.getLong(0), agg.getLong(1))
  }
}
