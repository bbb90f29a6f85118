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

  /** The lake's newest `date=` partition, from DIRECTORY NAMES alone —
    * no file listing inside partitions, no parquet footer reads, so
    * open-day detection is O(days), not O(history). Hadoop FS API, so
    * file:/hdfs://s3a:// lakes all work (a java.io.File check would
    * silently report non-local lakes as absent and degrade every
    * update to a full rewrite).
    */
  private def openDay(spark: SparkSession, outDir: String): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .map(_.getPath.getName.stripPrefix("date="))
      // only real ISO dates: a null time_bin would have produced a
      // date=__HIVE_DEFAULT_PARTITION__ directory that sorts after
      // every date ('_' > '9') and would poison the filter forever
      .filter(_.matches("\\d{4}-\\d{2}-\\d{2}"))
      .sorted.lastOption // ISO dates: lexicographic == chronological
  }

  /** Incrementally materialize `stats` (any frame with an epoch-ms
    * `time_bin_ms` column) into `outDir`, partitioned by derived
    * `date`. Returns what was recomputed.
    */
  final case class RetireStats(daysRetired: Long)

  /** Partition retirement — the reference's `retire_partitions` admin
    * table function (rust/analytics/src/lakehouse/
    * retire_partitions_table_function.rs): drop every day partition
    * strictly OLDER than `beforeDate` (ISO yyyy-MM-dd). Retention is a
    * directory-level operation: no data is read or rewritten, so
    * retiring a year of history costs O(days) filesystem calls — on a
    * catalog-backed lake (Delta/Iceberg) the same call becomes a
    * metadata-only drop.
    */
  def retireByDay(spark: SparkSession, outDir: String, beforeDate: String): RetireStats = {
    require(beforeDate.matches("\\d{4}-\\d{2}-\\d{2}"),
      s"retireByDay: beforeDate must be ISO yyyy-MM-dd, got $beforeDate")
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return RetireStats(0)
    val victims = fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .filter { s =>
        val d = s.getPath.getName.stripPrefix("date=")
        d.matches("\\d{4}-\\d{2}-\\d{2}") && d < beforeDate // ISO: lexicographic == chronological
      }
    victims.foreach(s => fs.delete(s.getPath, true))
    RetireStats(victims.size.toLong)
  }

  /** Surgical single-file retirement — the reference's
    * `retire_partition_by_file` admin UDF (rust/analytics/src/lakehouse/
    * retire_partition_by_file_udf.rs): drop ONE partition file by path,
    * leaving every other file in the lake untouched and queryable.
    * `relPath` is relative to the lake root (e.g.
    * "date=2024-01-03/part-0000….parquet"). Returns whether the file
    * existed. Directory traversal is rejected — an admin typo must not
    * be able to delete outside the lake.
    */
  def retireByFile(spark: SparkSession, outDir: String, relPath: String): Boolean = {
    require(!relPath.contains(".."), s"retireByFile: path escapes the lake: $relPath")
    require(relPath.endsWith(".parquet"), s"retireByFile: not a partition file: $relPath")
    val path = new org.apache.hadoop.fs.Path(s"$outDir/$relPath")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.delete(path, false)
  }

  /** Re-materialize ONE day partition from source — the
    * `regenerate_partitions` table function analog (rust/analytics/src/
    * lakehouse/regenerate_partitions_table_function.rs), the repair
    * path after a by-file retirement. Only the named `date` partition
    * is rewritten (dynamic overwrite); the source aggregation is
    * filtered to that day first, so the scan prunes to it.
    */
  def regenerateDay(spark: SparkSession, stats: DataFrame, outDir: String,
      date: String): Long = {
    require(date.matches("\\d{4}-\\d{2}-\\d{2}"),
      s"regenerateDay: date must be ISO yyyy-MM-dd, got $date")
    val day = stats
      .withColumn("date", to_date(timestamp_millis(col("time_bin_ms"))))
      .where(col("date") === to_date(lit(date)))
      .persist()
    try {
      val rows = day.count()
      if (rows > 0)
        day.write.option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").partitionBy("date").parquet(outDir)
      else {
        // dynamic overwrite of an empty frame touches nothing — the
        // damaged files being repaired would survive; an empty source
        // day repairs to an ABSENT partition
        val p = new org.apache.hadoop.fs.Path(s"$outDir/date=$date")
        val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (f.exists(p)) f.delete(p, true)
      }
      rows
    } finally day.unpersist()
  }

  /** Partition inventory — the reference's `list_partitions` metadata
    * function applied to a materialized lake: one row per day partition
    * with file count and byte size, from the filesystem listing alone.
    */
  def listPartitions(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows: Seq[(String, Long, Long)] =
      if (!fs.exists(path)) Seq.empty
      else fs.listStatus(path).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
        .map { s =>
          val files = fs.listStatus(s.getPath).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
          (s.getPath.getName.stripPrefix("date="), files.size.toLong, files.map(_.getLen).sum)
        }.sortBy(_._1)
    rows.toDF("date", "n_files", "bytes")
  }

  final case class ReplicationStats(daysCopied: Long, daysDropped: Long)

  /** Lake-to-lake incremental replication — the reference's
    * replication path (rust/analytics/src/replication.rs: pull
    * metadata + blocks from a remote lake, insert idempotently with
    * ON CONFLICT DO NOTHING). At day-partition granularity the same
    * contract is: ship every day whose file signature (names + byte
    * sizes — metadata only, no data read) differs from the replica's,
    * verbatim — replicated files are bitwise the source, never
    * re-encoded. Unchanged days are skipped (the conflict-skip), so a
    * re-run against an unchanged source is a filesystem-listing no-op;
    * a day the source rewrote (its open day closing, a regenerateDay
    * repair) is detected by the signature change and refreshed.
    * Replica-only days are DROPPED — replication mirrors the source,
    * so a retention run on the source (retireByDay) propagates;
    * without this the replica would diverge forever while reporting
    * no-op, and retired data would keep being served from it.
    */
  def replicate(spark: SparkSession, srcDir: String, dstDir: String): ReplicationStats = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = src.getFileSystem(conf)
    if (!fs.exists(src)) return ReplicationStats(0, 0)
    val dst = new org.apache.hadoop.fs.Path(dstDir)
    val dstFs = dst.getFileSystem(conf)
    def days(p: org.apache.hadoop.fs.Path, f: org.apache.hadoop.fs.FileSystem): Set[String] =
      if (!f.exists(p)) Set.empty
      else f.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
        .map(_.getPath.getName.stripPrefix("date="))
        .filter(_.matches("\\d{4}-\\d{2}-\\d{2}")).toSet
    def sig(root: org.apache.hadoop.fs.Path, f: org.apache.hadoop.fs.FileSystem,
        d: String): Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(root, s"date=$d")
      if (!f.exists(p)) Map.empty
      else f.listStatus(p).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
        .map(s => s.getPath.getName -> s.getLen).toMap
    }
    val srcDays = days(src, fs)
    val toCopy = srcDays.toSeq.sorted
      .filter(d => sig(src, fs, d) != sig(dst, dstFs, d))
    toCopy.foreach { d =>
      val to = new org.apache.hadoop.fs.Path(dst, s"date=$d")
      if (dstFs.exists(to)) dstFs.delete(to, true)
      org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src, s"date=$d"),
        dstFs, to, false /* deleteSource */, true /* overwrite */, conf)
    }
    val toDrop = (days(dst, dstFs) -- srcDays).toSeq.sorted
    toDrop.foreach(d => dstFs.delete(new org.apache.hadoop.fs.Path(dst, s"date=$d"), true))
    ReplicationStats(toCopy.size.toLong, toDrop.size.toLong)
  }

  def updateByDay(spark: SparkSession, stats: DataFrame, outDir: String): UpdateStats = {
    val withDate = stats.withColumn("date", to_date(timestamp_millis(col("time_bin_ms"))))
    val fresh = (openDay(spark, outDir) match {
      case Some(d) => withDate.where(col("date") >= to_date(lit(d)))
      case None => withDate
    }).persist() // written AND counted below — never recompute the source agg twice
    try {
      // per-write option, not session conf: a conf toggle would race
      // concurrent writers on the same session
      fresh.write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").partitionBy("date").parquet(outDir)
      val agg = fresh.agg(countDistinct("date"), count(lit(1))).head()
      UpdateStats(agg.getLong(0), agg.getLong(1))
    } finally fresh.unpersist()
  }
}
