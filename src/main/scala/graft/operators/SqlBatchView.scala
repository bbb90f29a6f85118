package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-defined incrementally-materialized SQL views — the Spark analog
  * of the reference's generic SQL batch view (rust/analytics/src/
  * lakehouse/sql_batch_view.rs + merge.rs `QueryMerger`): a view is
  * defined by SQL alone, as a (count, transform, merge) triple, and the
  * engine owns slicing, staleness detection, and query-time merging.
  *
  *  - `transformSql` extracts one time slice of source rows into
  *    partition rows; `{begin}`/`{end}` are epoch-ms placeholders the
  *    SQL uses to scope its scan (the filter pushes into parquet).
  *  - `mergeSql` re-aggregates partition rows into view rows at query
  *    time, with `{source}` standing for the scanned partitions — the
  *    reference runs the same query both to merge small partitions and
  *    to answer user queries spanning several partitions.
  *  - `countSrcSql` (count_src_query analog) is the cheap staleness
  *    probe: its scalar result is recorded per slice at write time and
  *    compared on the next update, so unchanged closed slices are
  *    skipped without reading their data.
  *
  * The lake is partitioned by `slice_ms` (slice begin). Re-running a
  * slice is an atomic per-partition dynamic overwrite — the active
  * partition of the reference's live ETL. Each slice's work is O(slice
  * source rows); query-time merge shuffles only partition rows (the
  * transform output is expected to be pre-aggregated, exactly like the
  * reference's log_stats instance).
  */
object SqlBatchView {

  /** A view defined purely by SQL. `name` keys the temp-view namespace;
    * the SQLs reference any registered view/table.
    */
  final case class Def(
      name: String,
      countSrcSql: String,
      transformSql: String,
      mergeSql: String)

  /** Canonical pure-SQL log_stats instance — the reference's
    * log_stats_view is exactly this triple over sql_batch_view
    * (rust/analytics/src/lakehouse/log_stats_view.rs:34-42). Shared by
    * the ScalaTest materialization suite and the oracle-checked
    * query-time-merge query (`m_sql_view_merge`).
    */
  val logStats: Def = Def(
    name = "log_stats_sql",
    countSrcSql = """SELECT count(*) AS n FROM log_entries
      WHERE time_ms >= {begin} AND time_ms < {end}""",
    transformSql = """
      SELECT time_ms - time_ms % 60000 AS time_bin_ms, process_id, level, target,
        count(*) AS count
      FROM log_entries
      WHERE time_ms >= {begin} AND time_ms < {end}
      GROUP BY 1, 2, 3, 4""",
    mergeSql = """
      SELECT time_bin_ms, process_id, level, target,
        CAST(sum(count) AS BIGINT) AS count
      FROM {source} GROUP BY 1, 2, 3, 4""")

  /** otel_spans as a batch view — the production path for the span
    * assembly (the reference's otel views are materialized batch
    * views, never recomputed per query; spans_view.rs builds on the
    * same partition machinery as log_stats_view.rs). The transform is
    * the full live derivation scoped to spans STARTING in the slice —
    * each span lands in exactly one slice, so the merge is a plain
    * pass-through and incremental materialization is bitwise equal to
    * the live view under ANY slicing (SqlBatchViewSpec pins this).
    * Serving then costs one parquet scan instead of the 3-replay /
    * 8-scan unmaterialized derivation.
    *
    * Staleness probe: a span STARTING in the slice only assembles
    * once its END event exists, and that end event's timestamp lies
    * beyond the slice — so the probe counts raw source events in
    * [begin, end + LATENESS), a declared 24h max-span-duration
    * horizon. An end event landing inside the horizon refreshes the
    * slice; a span open longer than the horizon is outside this
    * view's freshness contract (the reference's block-level
    * bookkeeping is the unbounded-lateness answer; count_src_query
    * is the same count-based approximation). SqlBatchViewSpec's
    * late-arrival case pins the refresh.
    */
  val otelSpansLatenessMs: Long = 24L * 3600000L
  val otelSpans: Def = Def(
    name = "otel_spans_sql",
    countSrcSql = s"""SELECT count(*) AS n FROM events
      WHERE unix_millis(ts) >= {begin} AND unix_millis(ts) < {end} + $otelSpansLatenessMs""",
    transformSql = """
      SELECT * FROM otel_spans
      WHERE start_time_ns >= {begin} * 1000000 AND start_time_ns < {end} * 1000000""",
    mergeSql = "SELECT * FROM {source}")

  private def subst(sql: String, beginMs: Long, endMs: Long): String =
    sql.replace("{begin}", beginMs.toString).replace("{end}", endMs.toString)

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metaPath(outDir: String, beginMs: Long) =
    new org.apache.hadoop.fs.Path(s"$outDir/_slice_$beginMs.count")

  /** Recorded source count for a slice, if it was ever materialized. */
  private def recordedCount(spark: SparkSession, outDir: String, beginMs: Long): Option[Long] = {
    val f = fs(spark, outDir)
    val p = metaPath(outDir, beginMs)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** The count_src_query probe: is the materialized slice up to date
    * with the source? Runs ONLY the cheap count SQL — never the
    * transform — mirroring fetch_sql_partition_spec's use of
    * count_src_query in the reference.
    */
  def isUpToDate(spark: SparkSession, v: Def, outDir: String,
      beginMs: Long, endMs: Long): Boolean = {
    val src = spark.sql(subst(v.countSrcSql, beginMs, endMs)).head().getLong(0)
    recordedCount(spark, outDir, beginMs).contains(src)
  }

  /** Materialize (or refresh) one [beginMs, endMs) slice. Skips the
    * transform entirely when the recorded source count matches; pass
    * `force = true` to rewrite regardless (regeneration path).
    * Returns the rows written, or -1 when skipped as fresh.
    */
  def updateSlice(spark: SparkSession, v: Def, outDir: String,
      beginMs: Long, endMs: Long, force: Boolean = false): Long = {
    val srcCount = spark.sql(subst(v.countSrcSql, beginMs, endMs)).head().getLong(0)
    if (!force && recordedCount(spark, outDir, beginMs).contains(srcCount)) return -1L
    val slice = spark.sql(subst(v.transformSql, beginMs, endMs))
      .withColumn("slice_ms", lit(beginMs))
      .persist() // written AND counted — don't run the transform twice
    try {
      val written = slice.count()
      if (written > 0)
        slice.write.option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").partitionBy("slice_ms").parquet(outDir)
      else {
        // dynamic overwrite of an EMPTY frame touches no partitions —
        // without an explicit delete the previous materialization of
        // this slice would keep being served while the freshness probe
        // (srcCount recorded below) reports up-to-date forever
        val stale = new org.apache.hadoop.fs.Path(s"$outDir/slice_ms=$beginMs")
        val f0 = fs(spark, outDir)
        if (f0.exists(stale)) f0.delete(stale, true)
      }
      val f = fs(spark, outDir)
      val out = f.create(metaPath(outDir, beginMs), true)
      try out.write(srcCount.toString.getBytes("UTF-8")) finally out.close()
      written
    } finally slice.unpersist()
  }

  /** Answer the view WITHOUT materializing: run the transform per
    * slice and the merge over the unioned slice outputs — the
    * reference's QueryMerger answering a user query that spans several
    * partitions (rust/analytics/src/lakehouse/merge.rs). Fully lazy:
    * each slice's `{begin}`/`{end}` predicate pushes into its own scan,
    * so on a time-partitioned lake every branch reads only its slice's
    * files, and the merge shuffles pre-aggregated partition rows only.
    */
  def queryAcrossSlices(spark: SparkSession, v: Def, slices: Seq[(Long, Long)]): DataFrame = {
    require(slices.nonEmpty, "at least one slice")
    val union = slices.map { case (b, e) => spark.sql(subst(v.transformSql, b, e)) }
      .reduce(_.union(_))
    val tmp = s"__sqlbatch_${v.name}_slices"
    union.createOrReplaceTempView(tmp)
    spark.sql(v.mergeSql.replace("{source}", tmp))
  }

  /** Query the view: scan the materialized partitions and run the merge
    * SQL over them. The same merge would compact many small slice
    * partitions into one (QueryMerger's other caller).
    */
  def query(spark: SparkSession, v: Def, outDir: String): DataFrame = {
    val tmp = s"__sqlbatch_${v.name}_source"
    spark.read.parquet(outDir).drop("slice_ms").createOrReplaceTempView(tmp)
    spark.sql(v.mergeSql.replace("{source}", tmp))
  }
}
