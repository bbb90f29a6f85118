package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.epochMs

/** The Spark analog of the reference's lakehouse view layer
  * (reference: rust/analytics/src/lakehouse/view_factory.rs,
  * view_instance_table_function.rs).
  *
  * Global views (`log_entries`, `measures`, `log_stats`) are lazily
  * defined DataFrames over the raw event stream; `viewInstance(name,
  * id)` is the JIT process-scoped view — a filter that Catalyst pushes
  * into the parquet scan, so a process-scoped query reads only the
  * matching row groups (and, on a date/process-partitioned cluster
  * layout, only the matching files).
  *
  * Mapping onto the test data (SURVEY §3): `events.user_id` plays the
  * role of process_id, `event_type` of target/name, `props` of
  * properties.
  */
final class Lakehouse(spark: SparkSession, dir: String) {

  def table(name: String): DataFrame = Tables.df(spark, dir, name)

  /** Severity mapping for the log view: errors are level 2, business
    * events informational (4), views debug-ish (5). Reference level
    * semantics: 1=Fatal .. 6=Trace, lower = more severe.
    */
  def logEntries: DataFrame = {
    val e = table("events")
    e.select(
      epochMs(col("ts")).as("time_ms"),
      col("event_id"),
      col("user_id").cast("string").as("process_id"),
      when(col("event_type") === "error", 2)
        .when(col("event_type") === "signup" || col("event_type") === "purchase", 4)
        .otherwise(5).as("level"),
      col("event_type").as("target"),
      concat(lit("event "), col("event_id").cast("string")).as("msg"),
      col("props").as("properties"))
  }

  /** Numeric measures view: every event carries a value sample. */
  def measures: DataFrame = {
    val e = table("events")
    e.select(
      epochMs(col("ts")).as("time_ms"),
      col("event_id"),
      col("user_id").cast("string").as("process_id"),
      col("event_type").as("name"),
      lit("units").as("unit"),
      col("value"),
      col("props").as("properties"))
  }

  /** Per-minute per-level counts — the log_stats incremental view shape
    * (reference: rust/analytics/src/lakehouse/log_stats_view.rs:34-42).
    */
  def logStats: DataFrame =
    logEntries
      .groupBy((col("time_ms") - pmod(col("time_ms"), lit(60000L))).as("time_bin_ms"),
        col("process_id"), col("level"), col("target"))
      .agg(count(lit(1)).as("count"))

  /** JIT process-scoped view instance. */
  /** Span view assembled from the event stream (reference:
    * rust/analytics/src/lakehouse/thread_spans_view.rs + the
    * process_spans table function in lakehouse/query.rs:138). The
    * process filter in viewInstance sits on the window partition key,
    * so Catalyst pushes it through the Window into the parquet scan —
    * the JIT property of the reference's process-scoped UDTF.
    */
  def threadSpans: DataFrame =
    graft.operators.SpanAssembly
      .consecutiveSpans(table("events"), "user_id", epochMs(col("ts")), "event_id", "event_type")
      .select(col("user_id").cast("string").as("process_id"),
        col("event_id"), col("name"), col("begin_ms"), col("end_ms"), col("duration_ms"))

  def viewInstance(view: String, instanceId: String): DataFrame = view match {
    case "log_entries"  => logEntries.where(col("process_id") === instanceId)
    case "measures"     => measures.where(col("process_id") === instanceId)
    case "log_stats"    => logStats.where(col("process_id") === instanceId)
    case "thread_spans" => threadSpans.where(col("process_id") === instanceId)
    case other => throw new IllegalArgumentException(s"unknown view set: $other")
  }

  /** Registered view sets (list_view_sets analog). */
  def viewSets: Seq[String] = Seq("log_entries", "measures", "log_stats", "thread_spans")
}
