package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** processes metadata view (reference processes_view.rs): one row
    * per telemetry source with lifetime + activity stats.
    */
  def processes: DataFrame =
    table("events")
      .groupBy(col("user_id").cast("string").as("process_id"))
      .agg(min(epochMs(col("ts"))).as("start_time_ms"),
        max(epochMs(col("ts"))).as("last_update_time_ms"),
        count(lit(1)).as("n_events"),
        countDistinct("event_type").as("n_streams"))

  /** streams metadata view (reference streams_view.rs): per (process,
    * stream kind) block stats — event_type plays the stream tag.
    */
  def streams: DataFrame =
    table("events")
      .groupBy(col("user_id").cast("string").as("process_id"), col("event_type").as("tag"))
      .agg(count(lit(1)).as("nb_objects"),
        min(epochMs(col("ts"))).as("min_event_time_ms"),
        max(epochMs(col("ts"))).as("max_event_time_ms"))

  /** blocks metadata view (reference blocks_view.rs): per (process,
    * stream) minute-bucket object counts, time range, payload size.
    */
  def blocks: DataFrame = {
    val ms = epochMs(col("ts"))
    table("events")
      .groupBy(col("user_id").cast("string").as("process_id"),
        col("event_type").as("stream_tag"),
        (ms - pmod(ms, lit(60000L))).as("block_start_ms"))
      .agg(count(lit(1)).as("nb_objects"),
        min(ms).as("min_event_time_ms"),
        max(ms).as("max_event_time_ms"),
        sum(length(col("props")).cast("long")).as("payload_bytes"))
  }

  /** Raw block payload bytes, reconstructed deterministically per
    * block (reference: rust/analytics/src/lakehouse/
    * get_payload_function.rs — the reference fetches the stored bytes
    * from blob storage; here the payload is the event-id-ordered
    * serialization of the block's rows: same shape, checkable
    * content). The double value is serialized as floor(value*100)
    * cents because double→string formatting is not identical across
    * engines. collect_list is per-block (blocks are minute slices,
    * intrinsically bounded) and sorted inside the row, never on the
    * driver. Shared by the oracle-checked m_block_payload query and
    * the get_payload SQL table function, so the synthesis can never
    * fork.
    */
  private def blockPayloadsFrom(e: DataFrame): DataFrame = {
    val ms = epochMs(col("ts"))
    val cents = floor(col("value") * lit(100.0)).cast("long")
    val keyed = e.select(col("event_id"),
      col("user_id").cast("string").as("process_id"),
      col("event_type").as("stream_tag"),
      (ms - pmod(ms, lit(60000L))).as("block_start_ms"),
      concat_ws(":", col("event_id").cast("string"), col("event_type"),
        cents.cast("string"), col("props")).as("line"))
    val payload = array_join(
      transform(array_sort(col("ls")), x => x.getField("line")), "\n")
    keyed.groupBy("process_id", "stream_tag", "block_start_ms")
      .agg(collect_list(struct(col("event_id"), col("line"))).as("ls"))
      .select(col("process_id"), col("stream_tag"), col("block_start_ms"),
        size(col("ls")).cast("long").as("nb_objects"),
        payload.cast("binary").as("payload"))
  }

  /** Every block's synthesized payload (the bulk/relational form). */
  def blockPayloads: DataFrame = blockPayloadsFrom(table("events"))

  /** One block's payload — the get_payload(process_id, stream_id,
    * block_id) fetch. The process/stream equalities are plain scan
    * predicates (on a process/date-partitioned lake they prune to
    * single files — the point of the reference's JIT fetch); the
    * block-start filter runs on the derived minute bucket.
    */
  def getPayload(processId: String, streamTag: String, blockStartMs: Long): DataFrame =
    blockPayloadsFrom(table("events")
      .where(col("user_id").cast("string") === processId &&
        col("event_type") === streamTag))
      .where(col("block_start_ms") === blockStartMs)

  /** Screenshot/image blocks view (reference:
    * rust/analytics/src/lakehouse/images_view.rs,
    * image_block_processor.rs, images_table.rs). The reference parses
    * ImageEvent objects out of transit blocks into (process metadata,
    * time, name, format, payload_size, data) rows; here the `view`
    * events play the screenshots and the payload bytes are synthesized
    * deterministically from the event (the blob fetch is storage
    * plumbing, not query semantics — same stance as m_block_payload).
    * Per-row expressions only; no shuffle.
    */
  def images: DataFrame = imagesFrom(table("events"))

  private def imagesFrom(e: DataFrame): DataFrame = {
    val ms = epochMs(col("ts"))
    val blockStart = ms - pmod(ms, lit(60000L))
    val pid = col("user_id").cast("string")
    val payload = concat(lit("IMG:"), col("event_id").cast("string"), lit(":"), col("props"))
    e.where(col("event_type") === "view").select(
      pid.as("process_id"),
      concat(pid, lit("-img")).as("stream_id"),
      concat(pid, lit("-img-"), blockStart.cast("string")).as("block_id"),
      // blocks flush at minute close — insert_time is the block end
      (blockStart + lit(60000L)).as("insert_time_ms"),
      concat(lit("app-"), pmod(col("user_id"), lit(4L)).cast("string"), lit(".exe")).as("exe"),
      concat(lit("user"), pid).as("username"),
      concat(lit("host-"), pmod(col("user_id"), lit(8L)).cast("string")).as("computer"),
      ms.as("time_ms"),
      col("event_id"),
      concat(lit("screenshot-"), col("event_id").cast("string")).as("name"),
      when(pmod(col("event_id"), lit(3L)) === 0, "png")
        .when(pmod(col("event_id"), lit(3L)) === 1, "jpeg")
        .otherwise("webp").as("format"),
      octet_length(payload).cast("long").as("payload_size"),
      payload.cast("binary").as("data"))
  }

  /** Raw UNPAIRED async span events — one row per begin and per end
    * (reference async_events_view.rs:35 + async_events_table.rs:43:
    * stream_id, block_id, time, event_type 'begin'/'end', span_id,
    * parent_span_id, depth, name). Users debugging lost/unmatched
    * async ends query this stream directly; `m_async_spans` is the
    * PAIRED companion. Derivation note: the reference's wire events
    * carry span/parent ids emitted by the instrumented app; the
    * synthetic corpus doesn't, so the ids are recovered by the same
    * stack decode the reference's block processor runs at ingestion,
    * then each span is unpivoted back to its two raw events.
    */
  def asyncEvents: DataFrame = asyncEventsFrom(table("events"))

  private def asyncEventsFrom(e: DataFrame): DataFrame = {
    val base = graft.operators.SpanAssembly.beginEndSpans(
      e, "user_id", epochMs(col("ts")), "event_id", "event_type",
      col("event_type").isin("signup", "view"))
    val sp = graft.operators.SpanAssembly.withParents(base, "user_id")
    sp.select(col("user_id"), col("span_id"), col("parent_id"), col("name"), col("depth"),
        explode(array(
          struct(lit("begin").as("etype"), col("begin_ms").as("t_ms")),
          struct(lit("end").as("etype"), col("end_ms").as("t_ms")))).as("ev"))
      .select(
        col("user_id").cast("string").as("process_id"),
        concat(col("user_id").cast("string"), lit("-async")).as("stream_id"),
        concat(col("user_id").cast("string"), lit("-async-"),
          (col("ev.t_ms") - pmod(col("ev.t_ms"), lit(60000L))).cast("string")).as("block_id"),
        col("ev.t_ms").as("time_ms"),
        col("ev.etype").as("event_type"),
        col("span_id"),
        col("parent_id").as("parent_span_id"),
        col("depth"),
        col("name"))
  }

  /** OTLP-shaped span view (reference:
    * rust/analytics/src/lakehouse/otel/spans_view.rs, spans_table.rs,
    * spans_block_processor.rs): W3C trace/span ids (hex), span kind,
    * status + status_message, and the begin-event properties as the
    * attribute map. Built on the same begin/end assembly as
    * thread_spans; status is derived from error events that fall inside
    * the span's interval (keyed containment join — the equi-key is the
    * process, so no all-pairs work).
    */
  def otelSpans: DataFrame = otelSpansFrom(table("events"))

  // In production this view is MATERIALIZED (the reference's otel views
  // are batch views built from ingested blocks, never recomputed per
  // query) — SqlBatchView is the mechanism; this lazy definition is the
  // transform. The status branch reads the PRE-parents assembly so the
  // costlier parent-linkage self-join isn't replayed for it.
  private def otelSpansFrom(e: DataFrame): DataFrame = {
    val base = graft.operators.SpanAssembly.beginEndSpans(
      e, "user_id", epochMs(col("ts")), "event_id", "event_type",
      col("event_type").isin("signup", "view"))
    val sp = graft.operators.SpanAssembly.withParents(base, "user_id")
    // error events inside the span window decide status (OTLP status
    // code vocabulary: spans_block_processor.rs proto_status_code_str)
    val errs = e.where(col("event_type") === "error")
      .select(col("user_id").as("e_uid"), epochMs(col("ts")).as("e_ms"))
    val errCount = base.select(col("user_id"), col("span_id"), col("begin_ms"), col("end_ms"))
      .join(errs, col("user_id") === col("e_uid") &&
        col("e_ms") >= col("begin_ms") && col("e_ms") <= col("end_ms"), "left_outer")
      .groupBy("span_id").agg(count(col("e_ms")).as("n_errors"))
    val attrs = e.select(col("event_id").as("a_id"), col("props").as("attributes"))
    val spanHex = (id: Column) => substring(md5(concat(lit("span:"), id.cast("string"))), 1, 16)
    sp.join(errCount, Seq("span_id"), "left_outer")
      .join(attrs, col("span_id") === col("a_id"), "left_outer")
      .select(
        col("user_id").cast("string").as("process_id"),
        md5(concat(lit("trace:"), col("user_id").cast("string"))).as("trace_id"),
        spanHex(col("span_id")).as("span_id"),
        when(col("parent_id") === -1L, lit(null).cast("string"))
          .otherwise(spanHex(col("parent_id"))).as("parent_span_id"),
        (col("begin_ms") * 1000000L).as("start_time_ns"),
        (col("end_ms") * 1000000L).as("end_time_ns"),
        (col("duration_ms") * 1000000L).as("duration_ns"),
        col("name"),
        when(col("name") === "signup", lit("SERVER")).otherwise(lit("INTERNAL")).as("kind"),
        when(coalesce(col("n_errors"), lit(0L)) > 0, lit("ERROR")).otherwise(lit("OK")).as("status"),
        when(coalesce(col("n_errors"), lit(0L)) > 0,
          concat(lit("errors="), col("n_errors").cast("string"))).as("status_message"),
        col("attributes"),
        lit("[]").as("events"),
        lit("[]").as("links"))
  }

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
      case "images"       => imagesFrom(scoped)
      case "otel_spans"   => otelSpansFrom(scoped)
      case "async_events" => asyncEventsFrom(scoped)
      case other => throw new IllegalArgumentException(s"unknown view set: $other")
    }
  }

  /** Registered view sets (list_view_sets analog). Note the reference's
    * ImagesView supports ONLY instance access (images_view.rs bails on
    * "global") — `images` here is still listed, but m_images queries it
    * through viewInstance, matching that contract.
    */
  def viewSets: Seq[String] =
    Seq("log_entries", "measures", "log_stats", "thread_spans", "images",
      "otel_spans", "async_events")
}
