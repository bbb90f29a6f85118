package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE-style tokenizer vocabulary induction: iterated greedy merge of
  * the corpus's most frequent adjacent token pair (Sennrich et al.
  * 2016 — the standard pretraining-tokenizer training loop).
  *
  * One round is two keyed aggregations plus windowed merge
  * application:
  *   1. pair statistics — (w, next_w) counts via a per-doc lead()
  *      window and a partial-agg-friendly groupBy (map-side combine,
  *      the shuffle carries distinct pairs, not token instances);
  *   2. the winning pair (count desc, pair asc — total order, so the
  *      pick is deterministic) broadcasts to every executor;
  *   3. greedy left-to-right application, relationally: a run of k
  *      consecutive occurrences of the pair merges at its 1st, 3rd,
  *      5th… positions — exactly gaps-and-islands parity. Mergeable
  *      positions get an island key (pos − running mergeable count);
  *      a position merges iff its offset from the island start is
  *      even; the position after a merge is consumed.
  *
  * Rounds iterate on the driver like Lloyd's k-means (Ann.kmeansRefine)
  * — per round the corpus shuffles once on doc_id for the windows and
  * once (pairs only) for the statistics; everything else is map-side.
  */
object Bpe {

  final case class Merge(w1: String, w2: String, count: Long)

  private val byDoc = Window.partitionBy("doc_id").orderBy("pos")

  /** (doc_id, pos, w) token table from a text column — the same
    * tokenizer as every l_* query (and their DuckDB oracles).
    */
  def tokens(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"),
      posexplode(TextAnalysis.whitespaceTokens(col(textCol))).as(Seq("pos", "w")))

  /** Pair statistics for the current token table. */
  def pairCounts(tok: DataFrame): DataFrame =
    tok.withColumn("w2", lead("w", 1).over(byDoc))
      .where(col("w2").isNotNull)
      .groupBy("w", "w2").agg(count(lit(1)).as("pair_n"))

  /** The deterministic winning pair, if any pair exists. */
  def topPair(tok: DataFrame): Option[Merge] =
    pairCounts(tok)
      .orderBy(col("pair_n").desc, col("w"), col("w2"))
      .limit(1).collect().headOption
      .map(r => Merge(r.getString(0), r.getString(1), r.getLong(2)))

  /** Apply one greedy merge of (w1, w2) → "w1_w2"; returns the new
    * token table with positions renumbered.
    */
  def applyMerge(tok: DataFrame, m: Merge): DataFrame =
    applyMergeJoined(tok.withColumn("tw1", lit(m.w1)).withColumn("tw2", lit(m.w2)))

  /** One greedy merge applied to a token ARRAY column in one pass —
    * the per-document kernel form of [[applyMergeJoined]]
    * (graft.functions.ShingleKernels.bpeMerge; BpeMergeKernelSpec pins
    * row-for-row equality against the relational gaps-and-islands
    * form on random token tables). Zero exchanges, zero windows: the
    * whole merge is a projection, so a query that already holds the
    * token array applies the merge without exploding the corpus
    * (VERDICT r15 item 4: l_bpe_merge's winning-pair subtree evaluated
    * twice and both checkpoint cures measured worse — this removes
    * the window machinery instead).
    */
  def mergeTokens(toks: Column, w1: Column, w2: Column): Column =
    call_function("graft_bpe_merge", toks, w1, w2)

  /** Core merge application for a token table that already carries the
    * winning pair as `tw1`/`tw2` columns (a literal for the trained
    * loop, a broadcast 1-row crossJoin for the fully-in-plan query —
    * both share THIS implementation so the parity logic cannot drift).
    */
  def applyMergeJoined(tok: DataFrame): DataFrame = {
    val merged = tok
      .withColumn("w2", lead("w", 1).over(byDoc))
      .withColumn("mergeable",
        coalesce(col("w") === col("tw1") && col("w2") === col("tw2"), lit(false)))
      .withColumn("runm",
        sum(when(col("mergeable"), 1L).otherwise(0L))
          .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ikey", col("pos") - col("runm"))
    val island = Window.partitionBy("doc_id", "ikey")
    merged
      .withColumn("island_start", min(when(col("mergeable"), col("pos"))).over(island))
      .withColumn("merged_at",
        col("mergeable") && (col("pos") - col("island_start")) % 2 === 0)
      .withColumn("consumed",
        coalesce(lag(col("merged_at"), 1).over(byDoc), lit(false)))
      .withColumn("tk",
        when(col("merged_at"), concat(col("w"), lit("_"), col("w2")))
          .when(!col("consumed"), col("w")))
      .where(col("tk").isNotNull)
      .select(col("doc_id"),
        (row_number().over(byDoc) - 1).as("pos"), col("tk").as("w"))
  }

  /** Tokenize-with-trained-merges — the SERVING path (Sennrich et al.
    * 2016 §3's encode loop): apply the learned merge list to a token
    * table greedily, in rank order. Each rank is one
    * [[applyMergeJoined]] pass, so application and training share the
    * exact parity semantics and cannot drift. The target is typically
    * NEW text the vocabulary was not trained on; cost is
    * O(ranks · target tokens), corpus-free.
    */
  def encode(tok: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(tok) { case (t, (a, b)) =>
      applyMerge(t, Merge(a, b, 0L)).localCheckpoint()
    }

  /** Train `rounds` merges; returns the final token table and the
    * merge list in order. Stops early when no pair remains.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): (DataFrame, Seq[Merge]) = {
    var tok = tokens(docs, textCol)
    val merges = Seq.newBuilder[Merge]
    var done = false
    for (_ <- 0 until rounds if !done) topPair(tok) match {
      case Some(m) =>
        merges += m
        // localCheckpoint cuts the per-round lineage growth (the same
        // pattern as Ann.kmeansRefine): without it round r's plan
        // re-derives rounds 0..r-1's windows from scratch
        tok = applyMerge(tok, m).localCheckpoint()
      case None => done = true
    }
    (tok, merges.result())
  }
}
