package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.SpanAssembly
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 third observability tranche: alert hygiene and trace
  * integrity.
  *
  *  - `m_alert_dedup`: notification-grouping accounting over M36's
  *    threshold crossings — Alertmanager-style grouping (all crossings
  *    of the same alert rule inside one window collapse into ONE
  *    page): per day, crossings fired, series involved, and the pages
  *    grouping saves. The alert-fatigue measure next to M81's
  *    flapping audit: flapping says "this series needs hysteresis",
  *    this says "this rule needs grouping, and here is the page
  *    volume it would save". One keyed lag window (samples →
  *    crossings) + a day-grid partial agg.
  *  - `m_orphan_spans`: call-tree integrity — non-root spans whose
  *    enclosing parent cannot be found (the linkage M22 materializes
  *    comes back empty). M72 audits the EVENT stream (begin/end
  *    imbalance); this audits the ASSEMBLED tree one level up:
  *    orphans mean dropped blocks or cross-block chains the assembly
  *    couldn't bridge — the reference's #1429 fix exists precisely
  *    because orphaned chains fragmented its call trees. Parent
  *    linkage is the bounded keyed band join m_call_tree uses; the
  *    rate is one partial agg per process.
  *  - `m_stream_staleness`: who has STOPPED reporting — per stream,
  *    minutes since its last block vs the lake's newest block, worst
  *    first. The current-freshness angle next to M94 (holes in the
  *    past) and M98 (cadence); metadata-only.
  */
object ObservabilityExt24 {

  private def events(s: SparkSession, dir: String): DataFrame = Tables.df(s, dir, "events")

  private def spans(s: SparkSession, dir: String): DataFrame =
    SpanAssembly.beginEndSpans(events(s, dir), "user_id", epochMs(col("ts")), "event_id",
      "event_type", col("event_type").isin("signup", "view"))

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery("m_alert_dedup", (s, dir) => {
      val lim = 300.0
      val m = events(s, dir).where(col("event_type") === "purchase")
        .select(col("user_id"), epochMs(col("ts")).as("t_ms"), col("event_id"), col("value"))
      val w = Window.partitionBy("user_id").orderBy(col("t_ms"), col("event_id"))
      val crossings = m.withColumn("prev", lag("value", 1).over(w))
        .where(col("value") > lim && col("prev").isNotNull && col("prev") <= lim)
        .select(col("user_id"), col("t_ms"))
      crossings
        .groupBy(expr("t_ms - t_ms % 86400000").as("day_ms"))
        .agg(count(lit(1)).as("n_crossings"),
          countDistinct("user_id").as("n_series"))
        .withColumn("pages_saved", col("n_crossings") - 1)
        .withColumn("saved_e4", expr("(n_crossings - 1) * 10000 div n_crossings"))
        .select("day_ms", "n_crossings", "n_series", "pages_saved", "saved_e4")
        .orderBy("day_ms")
    }, Some("""
      WITH m AS (
        SELECT user_id, epoch_ms(ts) AS t_ms, event_id, value,
          LAG(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev
        FROM events WHERE event_type = 'purchase'),
      cr AS (
        SELECT user_id, t_ms
        FROM m WHERE value > 300.0 AND prev IS NOT NULL AND prev <= 300.0)
      SELECT t_ms - t_ms % 86400000 AS day_ms,
        CAST(count(*) AS BIGINT) AS n_crossings,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_series,
        CAST(count(*) - 1 AS BIGINT) AS pages_saved,
        CAST(count(*) - 1 AS BIGINT) * 10000 // CAST(count(*) AS BIGINT) AS saved_e4
      FROM cr GROUP BY 1 ORDER BY day_ms""")),

    GraftQuery("m_orphan_spans", (s, dir) => {
      val linked = SpanAssembly.withParents(spans(s, dir), "user_id")
      linked.groupBy("user_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("depth") > 0, 1L).otherwise(0L)).as("n_nonroot"),
          sum(when(col("depth") > 0 && col("parent_id") === -1L, 1L).otherwise(0L))
            .as("n_orphans"))
        .withColumn("orphan_rate_e4",
          expr("n_orphans * 10000 div greatest(n_nonroot, 1)"))
        .select("user_id", "n_spans", "n_nonroot", "n_orphans", "orphan_rate_e4")
        .orderBy("user_id")
    }, Some(s"""${ObservabilityExt9.oracleLinked}
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_spans,
        CAST(SUM(CASE WHEN depth > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonroot,
        CAST(SUM(CASE WHEN depth > 0 AND parent_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_orphans,
        CAST(SUM(CASE WHEN depth > 0 AND parent_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          * 10000 // GREATEST(CAST(SUM(CASE WHEN depth > 0 THEN 1 ELSE 0 END) AS BIGINT), 1)
          AS orphan_rate_e4
      FROM fl GROUP BY 1 ORDER BY user_id""")),

    GraftQuery("m_stream_staleness", (s, dir) => {
      // the CURRENT-freshness angle of the completeness family: M94
      // audits holes in the past, M98 audits cadence, this ranks who
      // has STOPPED — per stream, minutes since its last block vs the
      // lake's newest block ("now" for a bounded dataset), flagged
      // stale past 120 min. Metadata-only; the lake max is a broadcast
      // scalar; output ordered worst-first.
      val blocks = new graft.Lakehouse(s, dir).blocks
        .groupBy("process_id", "stream_tag")
        .agg(max("block_start_ms").as("last_block_ms"),
          count(lit(1)).as("n_blocks"))
      val lakeMax = blocks.agg(max("last_block_ms").as("lake_max_ms"))
      blocks.crossJoin(broadcast(lakeMax))
        .withColumn("stale_min", expr("(lake_max_ms - last_block_ms) div 60000"))
        .withColumn("is_stale", when(col("stale_min") >= 120, 1L).otherwise(0L))
        .select("process_id", "stream_tag", "n_blocks", "last_block_ms",
          "stale_min", "is_stale")
        .orderBy(desc("stale_min"), col("process_id"), col("stream_tag"))
    }, Some("""
      WITH b AS (
        SELECT CAST(user_id AS VARCHAR) AS process_id, event_type AS stream_tag,
          epoch_ms(ts) - epoch_ms(ts) % 60000 AS block_start_ms
        FROM events),
      st AS (
        SELECT process_id, stream_tag, max(block_start_ms) AS last_block_ms,
          CAST(count(DISTINCT block_start_ms) AS BIGINT) AS n_blocks
        FROM b GROUP BY 1, 2),
      mx AS (SELECT max(last_block_ms) AS lake_max_ms FROM st)
      SELECT process_id, stream_tag, n_blocks, last_block_ms,
        (mx.lake_max_ms - last_block_ms) // 60000 AS stale_min,
        CAST(CASE WHEN (mx.lake_max_ms - last_block_ms) // 60000 >= 120
             THEN 1 ELSE 0 END AS BIGINT) AS is_stale
      FROM st CROSS JOIN mx
      ORDER BY stale_min DESC, process_id, stream_tag""")),

    GraftQuery("m_hysteresis_alerts", (s, dir) => {
      // the hysteresis (Schmitt-trigger) alert M81's flapping audit
      // prescribes: fire when the series crosses HI (100), clear only
      // below LO (50) — values oscillating inside the band produce
      // ONE page where the single-threshold rule (M36) pages on every
      // re-cross. State machine as a carry-forward window: tag samples
      // +1 above HI / 0 below LO / null in the band; the state at any
      // sample is the last non-null tag at-or-before it, and an alert
      // is a 0→1 (or first-sample) rising edge. Per series: raw
      // single-threshold crossings vs hysteresis alerts and the pages
      // the band saves. Keyed windows per series only.
      val hi = 100.0
      val lo = 50.0
      val m = events(s, dir).where(col("event_type") === "purchase")
        .select(col("user_id"), epochMs(col("ts")).as("t_ms"), col("event_id"), col("value"))
      val w = Window.partitionBy("user_id").orderBy(col("t_ms"), col("event_id"))
      val st = m
        .withColumn("tag",
          when(col("value") > hi, 1L).when(col("value") < lo, 0L).otherwise(lit(null)))
        .withColumn("state", coalesce(
          last("tag", ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(0L)))
        .withColumn("prev_state", coalesce(lag("state", 1).over(w), lit(0L)))
        .withColumn("hyst_fire",
          when(col("state") === 1 && col("prev_state") === 0, 1L).otherwise(0L))
        .withColumn("prev_value", lag("value", 1).over(w))
        .withColumn("raw_fire", // first evaluation above HI also pages
          when(col("value") > hi &&
            (col("prev_value").isNull || col("prev_value") <= hi), 1L).otherwise(0L))
      st.groupBy("user_id")
        .agg(sum("raw_fire").as("n_raw_crossings"),
          sum("hyst_fire").as("n_hyst_alerts"))
        .where(col("n_raw_crossings") > 0 || col("n_hyst_alerts") > 0)
        .withColumn("pages_saved", col("n_raw_crossings") - col("n_hyst_alerts"))
        .orderBy("user_id")
    }, Some("""
      WITH m AS (
        SELECT user_id, epoch_ms(ts) AS t_ms, event_id, value
        FROM events WHERE event_type = 'purchase'),
      t AS (
        SELECT *, CASE WHEN value > 100.0 THEN 1
                       WHEN value < 50.0 THEN 0 END AS tag,
          LAG(value) OVER (PARTITION BY user_id ORDER BY t_ms, event_id) AS prev_value
        FROM m),
      st AS (
        SELECT *, COALESCE(last_value(tag IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY t_ms, event_id
            ROWS UNBOUNDED PRECEDING), 0) AS state
        FROM t),
      e AS (
        SELECT *, COALESCE(LAG(state) OVER (
            PARTITION BY user_id ORDER BY t_ms, event_id), 0) AS prev_state
        FROM st)
      SELECT user_id,
        CAST(SUM(CASE WHEN value > 100.0
                       AND (prev_value IS NULL OR prev_value <= 100.0)
                  THEN 1 ELSE 0 END) AS BIGINT)
          AS n_raw_crossings,
        CAST(SUM(CASE WHEN state = 1 AND prev_state = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_hyst_alerts,
        CAST(SUM(CASE WHEN value > 100.0
                       AND (prev_value IS NULL OR prev_value <= 100.0)
                  THEN 1 ELSE 0 END)
           - SUM(CASE WHEN state = 1 AND prev_state = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS pages_saved
      FROM e GROUP BY 1
      HAVING SUM(CASE WHEN value > 100.0
                       AND (prev_value IS NULL OR prev_value <= 100.0)
                  THEN 1 ELSE 0 END) > 0
          OR SUM(CASE WHEN state = 1 AND prev_state = 0 THEN 1 ELSE 0 END) > 0
      ORDER BY user_id"""))
  )
}
