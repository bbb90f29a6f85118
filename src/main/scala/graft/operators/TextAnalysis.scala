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

  def tokenCount(text: Column): Column = size(whitespaceTokens(text)).cast("long")

  /** BPE-ish token count: alpha runs, digit runs, and single symbols —
    * the usual pre-tokenizer shape.
    */
  def bpeishTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def stopwordRatio(text: Column, stopwords: Seq[String] = stopwordsEn): Column = {
    val toks = whitespaceTokens(text)
    val stops = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  def meanTokenLength(text: Column): Column = {
    val toks = whitespaceTokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

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
    val toks = whitespaceTokens(text)
    def hits(markers: Seq[String]): Column = {
      val m = array(markers.map(lit): _*)
      size(filter(toks, t => array_contains(m, t)))
    }
    val en = hits(Seq("the", "a", "of", "and"))
    val es = hits(Seq("el", "la", "de", "que"))
    val de = hits(Seq("der", "die", "das", "und"))
    when(en >= es && en >= de && en > 0, lit("en"))
      .when(es >= de && es > 0, lit("es"))
      .when(de > 0, lit("de"))
      .otherwise(lit("unk"))
  }

  /** Rolling-hash document fingerprint: min md5 over word 4-gram
    * windows (winnowing with a single global window). Cross-engine
    * reproducible (md5 hex, lexicographic min).
    */
  def fingerprint(text: Column): Column =
    array_min(transform(Dedup.wordShingles(text, 4), s => md5(s)))
}
