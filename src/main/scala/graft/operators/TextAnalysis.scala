package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: token counts,
  * quality scores, language-ID heuristics, fingerprints. All pure
  * column expressions (codegen'd, partition-local, no shuffle).
  */
object TextAnalysis {

  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def whitespaceTokens(text: Column): Column = split(trim(text), "\\s+")

  /** One-pass integer stats struct (graft.functions.TextStatsKernels):
    * all the primitives below read fields off this ONE deterministic
    * expression, so a projection computing several of them evaluates
    * the text scan once (subexpression elimination — which the
    * interpreted HOF-filter forms these replaced structurally defeat).
    * Field-for-field equality with the composed forms is
    * property-checked in TextStatsKernelSpec; the double arithmetic
    * below is UNCHANGED, so scores stay bit-identical.
    */
  private def stats(text: Column): Column = call_function("graft_textstats", text)

  /** The raw stats struct, for composites (C4 rules) that read several
    * fields at once: n_tokens, sum_tok_len, punct_chars, n_chars,
    * stop_en8, mark_en/es/de, max_tok_len, n_digits, has_the.
    */
  def textStats(text: Column): Column = stats(text)

  def tokenCount(text: Column): Column = stats(text).getField("n_tokens")

  /** BPE-ish token count: alpha runs, digit runs, and single symbols —
    * the usual pre-tokenizer shape.
    */
  def bpeishTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  def punctRatio(text: Column): Column =
    stats(text).getField("punct_chars").cast("double") /
      greatest(stats(text).getField("n_chars"), lit(1)).cast("double")

  def stopwordRatio(text: Column, stopwords: Seq[String] = stopwordsEn): Column =
    if (stopwords == stopwordsEn)
      stats(text).getField("stop_en8").cast("double") /
        greatest(stats(text).getField("n_tokens"), lit(1)).cast("double")
    else {
      // non-default lists keep the composed form (no kernel field)
      val toks = whitespaceTokens(text)
      val stops = array(stopwords.map(lit): _*)
      size(filter(toks, t => array_contains(stops, t))).cast("double") /
        greatest(size(toks), lit(1)).cast("double")
    }

  def meanTokenLength(text: Column): Column =
    stats(text).getField("sum_tok_len").cast("double") /
      greatest(stats(text).getField("n_tokens"), lit(1)).cast("double")

  /** Composite quality score in [0,1]-ish: favors stopword presence,
    * moderate token length, low punctuation. Deterministic arithmetic
    * reproducible in ANSI SQL for the oracle.
    */
  def qualityScore(text: Column): Column =
    graft.queries.round(
      lit(0.5) * stopwordRatio(text) +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.2) * least(tokenCount(text).cast("double") / lit(200.0), lit(1.0)), 4)

  /** Language-ID heuristic: score languages by marker-token hits. */
  def langIdHeuristic(text: Column): Column = {
    val en = stats(text).getField("mark_en")
    val es = stats(text).getField("mark_es")
    val de = stats(text).getField("mark_de")
    when(en >= es && en >= de && en > 0, lit("en"))
      .when(es >= de && es > 0, lit("es"))
      .when(de > 0, lit("de"))
      .otherwise(lit("unk"))
  }

  /** Rolling-hash document fingerprint: min md5 over word 4-gram
    * windows (winnowing with a single global window). Cross-engine
    * reproducible (md5 hex, lexicographic min). graft_md5min = the
    * `array_min(transform(shingles, s => md5(s)))` fold in one pass
    * (hex encoding is order-isomorphic to unsigned digest bytes).
    */
  def fingerprint(text: Column): Column =
    call_function("graft_md5min", Dedup.wordShingles(text, 4))
}
