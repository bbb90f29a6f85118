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
  def logEntries: DataFrame = logEntriesFrom(table("events"))

  private def logEntriesFrom(e: DataFrame): DataFrame =
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

  /** Numeric measures view: every event carries a value sample. */
  def measures: DataFrame = measuresFrom(table("events"))

  private def measuresFrom(e: DataFrame): DataFrame =
    e.select(
      epochMs(col("ts")).as("time_ms"),
      col("event_id"),
      col("user_id").cast("string").as("process_id"),
      col("event_type").as("name"),
      lit("units").as("unit"),
      col("value"),
      col("props").as("properties"))

  /** Per-minute per-level counts — the log_stats incremental view shape
    * (reference: rust/analytics/src/lakehouse/log_stats_view.rs:34-42).
    */
  def logStats: DataFrame = logStatsFrom(table("events"))

  private def logStatsFrom(e: DataFrame): DataFrame =
    logEntriesFrom(e)
      .groupBy((col("time_ms") - pmod(col("time_ms"), lit(60000L))).as("time_bin_ms"),
        col("process_id"), col("level"), col("target"))
      .agg(count(lit(1)).as("count"))

  /** Span view assembled from the event stream (reference:
    * rust/analytics/src/lakehouse/thread_spans_view.rs + the
    * process_spans table function in lakehouse/query.rs:138).
    */
  def threadSpans: DataFrame = threadSpansFrom(table("events"))

  private def threadSpansFrom(e: DataFrame): DataFrame =
    graft.operators.SpanAssembly
      .consecutiveSpans(e, "user_id", epochMs(col("ts")), "event_id", "event_type")
      .select(col("user_id").cast("string").as("process_id"),
        col("event_id"), col("name"), col("begin_ms"), col("end_ms"), col("duration_ms"))

  /** JIT process-scoped view instance. The scope is applied to the RAW
    * source column (`user_id`), not the projected string `process_id`:
    * a `cast(user_id as string) = id` predicate cannot reach the
    * parquet reader, while `user_id = <id as long>` unwraps to a native
    * pushed filter — row-group pruning (and file pruning on a
    * process-partitioned layout), which is the point of the reference's
    * JIT view_instance/process_spans functions. Only a CANONICAL
    * numeric id takes that path: "07" or " 7" must match nothing (the
    * string semantics), not be coerced onto process 7.
    */
  def viewInstance(view: String, instanceId: String): DataFrame = {
    val canonical = scala.util.Try(instanceId.toLong).toOption
      .filter(_.toString == instanceId)
    val scoped = canonical match {
      case Some(id) => table("events").where(col("user_id").cast("long") === id)
      case None     => table("events").where(lit(false)) // non-canonical: empty
    }
    view match {
      case "log_entries"  => logEntriesFrom(scoped)
      case "measures"     => measuresFrom(scoped)
      case "log_stats"    => logStatsFrom(scoped)
      case "thread_spans" => threadSpansFrom(scoped)
      case other => throw new IllegalArgumentException(s"unknown view set: $other")
    }
  }

  /** Registered view sets (list_view_sets analog). */
  def viewSets: Seq[String] = Seq("log_entries", "measures", "log_stats", "thread_spans")
}
