package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 second LLM-pipeline tranche: gate-knob pricing and
  * syndication structure.
  *
  *  - `l_quality_threshold_curve`: the quality-gate counterpart of
  *    L78's dedup-threshold curve — for each candidate quality cutoff
  *    (score e4, 1000-step grid), documents and tokens surviving and
  *    the surviving token share. A quality gate's threshold is a
  *    token-budget decision; this is the table that decision reads
  *    (raise the bar 1 step = lose how many tokens?). Uses the SAME
  *    q10k scorer as l_curation_pipeline / l_quality_quantile_norm so
  *    the priced knob is the one the pipeline actually runs.
  *  - `l_dup_family_sources`: cross-source syndication — for each
  *    shared-prefix duplicate family (L52's first-16-token key, ≥2
  *    docs), how many sources it spans and how concentrated it is
  *    (majority-source share e4). L52 elects keepers WITHIN families;
  *    this reads their source COMPOSITION: families confined to one
  *    source are crawl artifacts (dedup locally), families spanning
  *    sources are syndicated content — removing them changes the
  *    SOURCE MIX, which L31/L63's mixture planning must know about.
  *
  * Scale shape: the threshold curve is one scored scan cross-joined
  * with a 10-row broadcast grid and reduced by a partial agg; the
  * family table is two keyed HashAggregates (fingerprint×source →
  * fingerprint), never a pair join.
  */
object LlmPipelineExt18 {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.df(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
  }

  /** The shared q10k scorer as DuckDB CTEs (lock-step with
    * TextAnalysis.qualityScore·10⁴ — the l_curation_pipeline scorer,
    * same text as LlmPipelineExt10.oracleQ10kWithSource).
    */
  private val oracleQ10k = """
      WITH qf AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t,
          CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
            / GREATEST(length(text), 1) AS punct_ratio,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
              x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE)
            / GREATEST(len(string_split_regex(trim(text), '\s+')), 1) AS stop_ratio
        FROM documents),
      q AS (
        SELECT doc_id, source, CAST(len(t) AS BIGINT) AS toks,
          CAST(round(round(0.5 * stop_ratio + 0.3 * (1.0 - punct_ratio)
                + 0.2 * LEAST(CAST(len(t) AS DOUBLE) / 200.0, 1.0), 4)
               * 10000.0, 0) AS BIGINT) AS q10k
        FROM qf)"""

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery("l_quality_threshold_curve", (s, dir) => {
      val scored = docs(s, dir).select(
        round(TextAnalysis.qualityScore(col("text")) * lit(10000.0), 0)
          .cast("long").as("q10k"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      val tot = scored.agg(sum("toks").as("total_tokens"))
      val grid = s.createDataFrame((0 to 9).map(i => Tuple1(i * 1000L)))
        .toDF("threshold_e4")
      scored.crossJoin(broadcast(grid))
        .where(col("q10k") >= col("threshold_e4"))
        .groupBy("threshold_e4")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("tokens"))
        .crossJoin(broadcast(tot))
        .withColumn("token_share_e4", expr("tokens * 10000 div total_tokens"))
        .select("threshold_e4", "n_docs", "tokens", "token_share_e4")
        .orderBy("threshold_e4")
    }, Some(s"""$oracleQ10k,
      th AS (SELECT CAST(unnest(range(0, 10)) * 1000 AS BIGINT) AS threshold_e4),
      surv AS (
        SELECT th.threshold_e4, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(SUM(q.toks) AS BIGINT) AS tokens
        FROM q JOIN th ON q.q10k >= th.threshold_e4
        GROUP BY 1),
      tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total_tokens FROM q)
      SELECT threshold_e4, n_docs, tokens,
        tokens * 10000 // t.total_tokens AS token_share_e4
      FROM surv CROSS JOIN tot t ORDER BY threshold_e4""")),

    GraftQuery("l_dup_family_sources", (s, dir) => {
      // family key = first-16-token hash (L52's shared-prefix key)
      val t = split(trim(col("text")), "\\s+")
      val prefix = md5(array_join(slice(t, 1, 16), " "))
      val bySrc = docs(s, dir)
        .select(prefix.as("norm_h"), col("source"))
        .groupBy("norm_h", "source").agg(count(lit(1)).as("n"))
      bySrc.groupBy("norm_h")
        .agg(sum("n").as("n_docs"),
          count(lit(1)).as("n_sources"),
          max("n").as("top_src_n"))
        .where(col("n_docs") >= 2)
        .withColumn("majority_share_e4", expr("top_src_n * 10000 div n_docs"))
        .withColumn("cross_source", when(col("n_sources") >= 2, 1L).otherwise(0L))
        .select("norm_h", "n_docs", "n_sources", "majority_share_e4", "cross_source")
        .orderBy("norm_h")
    }, Some("""
      WITH tk AS (SELECT source, string_split_regex(trim(text), '\s+') AS t FROM documents),
      n AS (
        SELECT md5(array_to_string(t[1:16], ' ')) AS norm_h, source
        FROM tk),
      bs AS (
        SELECT norm_h, source, CAST(count(*) AS BIGINT) AS cnt
        FROM n GROUP BY 1, 2),
      fam AS (
        SELECT norm_h, CAST(SUM(cnt) AS BIGINT) AS n_docs,
          CAST(count(*) AS BIGINT) AS n_sources,
          CAST(max(cnt) AS BIGINT) AS top_src_n
        FROM bs GROUP BY 1)
      SELECT norm_h, n_docs, n_sources,
        top_src_n * 10000 // n_docs AS majority_share_e4,
        CAST(CASE WHEN n_sources >= 2 THEN 1 ELSE 0 END AS BIGINT) AS cross_source
      FROM fam WHERE n_docs >= 2
      ORDER BY norm_h"""))
  )
}
