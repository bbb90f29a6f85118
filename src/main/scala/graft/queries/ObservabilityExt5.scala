package graft.queries

import graft.{GraftQuery, Lakehouse}
import org.apache.spark.sql.functions._

/** Fifth observability tranche: the two remaining reference view sets —
  * screenshot/image blocks and OTLP-shaped spans.
  *
  *  - `m_images`: images view (reference images_view.rs +
  *    image_block_processor.rs + images_table.rs). The reference only
  *    allows process-scoped instances, so the query goes through
  *    `viewInstance("images", id)` — the filter pushes to the scan.
  *  - `m_otel_spans` / `m_otel_instance`: otel_spans view (reference
  *    otel/spans_view.rs + otel/spans_table.rs +
  *    otel/spans_block_processor.rs): W3C hex trace/span/parent ids,
  *    kind + status vocabularies, begin-event properties as attributes.
  */
object ObservabilityExt5 {

  /** Shared spans+parents+status oracle prefix (the thread-span
    * assembly identical to ObservabilityExt2.oracleSpans, then parent
    * linkage and in-span error accounting). `scope` restricts the
    * event stream for JIT instances.
    */
  private def oracleOtel(scope: String): String = s"""
      WITH tagged AS (
        SELECT user_id, event_id, event_type AS name, epoch_ms(ts) AS t_ms,
          (event_type IN ('signup','view')) AS is_begin,
          CASE WHEN event_type IN ('signup','view') THEN 1 ELSE -1 END AS delta
        FROM events $scope),
      d AS (
        SELECT *, SUM(delta) OVER (PARTITION BY user_id ORDER BY t_ms, event_id ROWS UNBOUNDED PRECEDING) AS post_depth
        FROM tagged),
      dd AS (
        SELECT *, CASE WHEN is_begin THEN post_depth - 1 ELSE post_depth END AS depth FROM d),
      sq AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, depth, is_begin ORDER BY t_ms, event_id) AS seq FROM dd),
      b AS (SELECT user_id, depth, seq, name, t_ms AS begin_ms, event_id AS span_id FROM sq WHERE is_begin),
      e AS (SELECT user_id, depth, seq, t_ms AS end_ms FROM sq WHERE NOT is_begin),
      spans AS (
        SELECT b.user_id, span_id, name, CAST(depth AS BIGINT) AS depth, begin_ms, end_ms,
          end_ms - begin_ms AS duration_ms
        FROM b JOIN e USING (user_id, depth, seq)
        WHERE end_ms >= begin_ms),
      linked AS (
        SELECT ch.user_id, ch.span_id, ch.name, ch.begin_ms, ch.end_ms, ch.duration_ms,
          p.span_id AS parent_id,
          ROW_NUMBER() OVER (PARTITION BY ch.user_id, ch.span_id
                             ORDER BY p.begin_ms DESC, p.span_id DESC) AS rk
        FROM spans ch LEFT JOIN spans p
          ON p.user_id = ch.user_id AND p.depth = ch.depth - 1
         AND p.begin_ms <= ch.begin_ms AND p.end_ms >= ch.end_ms),
      base AS (SELECT * FROM linked WHERE rk = 1),
      errs AS (SELECT user_id, epoch_ms(ts) AS e_ms FROM events
               WHERE event_type = 'error' ${if (scope.isEmpty) "" else scope.replace("WHERE", "AND")}),
      errc AS (
        SELECT s.span_id, count(e.e_ms) AS n_errors
        FROM base s LEFT JOIN errs e
          ON e.user_id = s.user_id AND e.e_ms BETWEEN s.begin_ms AND s.end_ms
        GROUP BY s.span_id)
      SELECT CAST(s.user_id AS VARCHAR) AS process_id,
        md5('trace:' || CAST(s.user_id AS VARCHAR)) AS trace_id,
        substring(md5('span:' || CAST(s.span_id AS VARCHAR)), 1, 16) AS span_id,
        CASE WHEN s.parent_id IS NULL THEN NULL
             ELSE substring(md5('span:' || CAST(s.parent_id AS VARCHAR)), 1, 16) END AS parent_span_id,
        s.begin_ms * 1000000 AS start_time_ns,
        s.end_ms * 1000000 AS end_time_ns,
        s.duration_ms * 1000000 AS duration_ns,
        s.name,
        CASE WHEN s.name = 'signup' THEN 'SERVER' ELSE 'INTERNAL' END AS kind,
        CASE WHEN c.n_errors > 0 THEN 'ERROR' ELSE 'OK' END AS status,
        CASE WHEN c.n_errors > 0 THEN 'errors=' || CAST(c.n_errors AS VARCHAR) END AS status_message,
        ev.props AS attributes,
        '[]' AS events, '[]' AS links
      FROM base s JOIN errc c USING (span_id)
      LEFT JOIN events ev ON ev.event_id = s.span_id
      ORDER BY process_id, span_id"""

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery("m_images", (s, dir) => {
      // reference ImagesView is instance-only (images_view.rs bails on
      // "global"); the binary payload is emitted as md5 + size so the
      // result stays metadata-sized and exactly oracle-checkable
      new Lakehouse(s, dir).viewInstance("images", "7")
        .select(col("process_id"), col("stream_id"), col("block_id"),
          col("insert_time_ms"), col("exe"), col("username"), col("computer"),
          col("time_ms"), col("event_id"), col("name"), col("format"),
          col("payload_size"), md5(col("data")).as("data_md5"))
        .orderBy("event_id")
    }, Some("""
      WITH img AS (
        SELECT user_id, event_id, props, epoch_ms(ts) AS time_ms,
          epoch_ms(ts) - epoch_ms(ts) % 60000 AS block_start_ms,
          'IMG:' || CAST(event_id AS VARCHAR) || ':' || props AS payload
        FROM events WHERE event_type = 'view' AND CAST(user_id AS VARCHAR) = '7')
      SELECT CAST(user_id AS VARCHAR) AS process_id,
        CAST(user_id AS VARCHAR) || '-img' AS stream_id,
        CAST(user_id AS VARCHAR) || '-img-' || CAST(block_start_ms AS VARCHAR) AS block_id,
        block_start_ms + 60000 AS insert_time_ms,
        'app-' || CAST(user_id % 4 AS VARCHAR) || '.exe' AS exe,
        'user' || CAST(user_id AS VARCHAR) AS username,
        'host-' || CAST(user_id % 8 AS VARCHAR) AS computer,
        time_ms, event_id,
        'screenshot-' || CAST(event_id AS VARCHAR) AS name,
        CASE event_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
        CAST(strlen(payload) AS BIGINT) AS payload_size,
        md5(payload) AS data_md5
      FROM img ORDER BY event_id""")),

    GraftQuery("m_otel_spans", (s, dir) => {
      new Lakehouse(s, dir).otelSpans
        .orderBy("process_id", "span_id")
    }, Some(oracleOtel(""))),

    GraftQuery("m_otel_instance", (s, dir) => {
      // JIT process-scoped otel_spans — the filter is applied to the
      // raw source before assembly, so the scan reads one process
      new Lakehouse(s, dir).viewInstance("otel_spans", "7")
        .orderBy("process_id", "span_id")
    }, Some(oracleOtel("WHERE CAST(user_id AS VARCHAR) = '7'")))
  )
}
