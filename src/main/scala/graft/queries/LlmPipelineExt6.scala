package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation-pipeline tranche 6: product quantization (PQ) for
  * embedding retrieval — the compression layer every billion-vector
  * ANN index rests on (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"; the IVFADC structure FAISS popularized).
  *
  *  - `l_ann_pq`: the full PQ retrieval path. Vectors are split into
  *    M=8 subspaces of 8 dims; each subspace gets a K=16-entry
  *    codebook (deterministic vec_id-sample, the same convention as
  *    `l_ann_ivf`'s coarse centroids); every vector is encoded as its
  *    per-subspace nearest-codeword ids — 8 small ints, a 64-byte
  *    float vector compressed 32×. Queries score candidates with
  *    asymmetric distance computation (ADC): one K×M distance table
  *    per query, then a table-lookup sum per candidate — no original
  *    vectors touched at scan time.
  *
  * Exactness: vectors ride as scaled integers (round(x·1000) BIGINT,
  * the shared-space analog of `l_embed_quantize`'s per-vector int8),
  * and every distance is an integer sum of squared integer deltas —
  * assignment, the ADC table, and the final ranking are all
  * bit-reproducible cross-engine (ties broken by codeword/neighbor
  * id), like `l_ann_int8`'s integer dot ranking.
  *
  * Scale shape: the codebook is O(M·K) and BROADCASTS; encoding is a
  * map-side join producing the O(n) codes table (8 B/vector — the
  * whole point: a 100 TB float corpus becomes a ~3 TB code table);
  * ADC tables are O(queries·M·K) and broadcast; candidate scoring
  * never shuffles the corpus, only the (query, candidate, partial
  * sums) triples feed the per-query top-k. In production the
  * candidate set comes from an IVF coarse stage (`l_ann_ivf`) instead
  * of the full corpus — composing the two is exactly IVFADC.
  */
object LlmPipelineExt6 {

  private def embs(s: SparkSession, dir: String): DataFrame = Tables.df(s, dir, "embeddings")

  /** Integer squared-L2 between two BIGINT arrays (zip-fold, codegen). */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery("l_ann_pq", (s, dir) => {
      val e = embs(s, dir).select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * 1000, 0).cast("long")).as("qv"))
      // one row per (vector, subspace): sub-vector slices
      val subs = e
        .withColumn("sub", explode(sequence(lit(0L), lit(7L))))
        .withColumn("sv", slice(col("qv"), (col("sub") * 8 + 1).cast("int"), lit(8)))
        .select("vec_id", "sub", "sv")
      // per-subspace codebook: the first 16 vectors' sub-slices
      val cb = subs.where(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("sub"), col("sv").as("cv"))
      // encoding: nearest codeword per (vector, subspace). argmin as
      // min over the PACKED long l2*K + cent_id — lexicographic
      // (distance, codeword-id) with the id tie-break, on a LONG so it
      // HashAggregates with map-side partials (min over a struct falls
      // back to SortAggregate — the same lesson as the minhash
      // signature rework): the shuffle carries one row per
      // (vector, subspace), not K candidate rows. No overflow: l2 ≤
      // 8·(2·10³)² ≈ 3.2e7, ×16 far inside long range.
      val codes = subs.join(broadcast(cb), "sub")
        .withColumn("l2", l2sq(col("sv"), col("cv")))
        .groupBy("vec_id", "sub")
        .agg(min(col("l2") * 16 + col("cent_id")).as("pm"))
        .select(col("vec_id"), col("sub"), (col("pm") % 16).as("code"))
      // ADC distance tables for the query vectors
      val dt = subs.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("sub").as("qsub"), col("sv").as("qsv"))
        .join(broadcast(cb), col("qsub") === cb("sub"))
        .select(col("query_id"), col("qsub"), col("cent_id"),
          l2sq(col("qsv"), col("cv")).as("dl2"))
      // candidate scoring: table lookup + per-query sum, then top-k
      val scored = codes
        .join(broadcast(dt), col("sub") === col("qsub") && col("code") === col("cent_id"))
        .where(col("vec_id") =!= col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(sum("dl2").as("adc_l2"))
      val rw = Window.partitionBy("query_id").orderBy(col("adc_l2"), col("vec_id"))
      scored.withColumn("rk", row_number().over(rw).cast("long"))
        .where(col("rk") <= 5)
        .select(col("query_id"), col("rk"), col("vec_id").as("neighbor_id"), col("adc_l2"))
        .orderBy("query_id", "rk")
    }, Some("""
      WITH e AS (
        SELECT vec_id,
          list_transform(CAST(embedding AS DOUBLE[]),
                         x -> CAST(round(x * 1000, 0) AS BIGINT)) AS qv
        FROM embeddings),
      subs AS (
        SELECT vec_id, sub, list_slice(qv, sub*8 + 1, sub*8 + 8) AS sv
        FROM e CROSS JOIN (SELECT unnest(range(8)) AS sub)),
      cb AS (
        SELECT vec_id AS cent_id, sub, sv AS cv FROM subs WHERE vec_id < 16),
      asg AS (
        SELECT vec_id, sub, cent_id AS code FROM (
          SELECT s.vec_id, s.sub, c.cent_id,
            ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
              ORDER BY CAST(list_dot_product(s.sv, s.sv) + list_dot_product(c.cv, c.cv)
                          - 2*list_dot_product(s.sv, c.cv) AS BIGINT), c.cent_id) AS crk
          FROM subs s JOIN cb c USING (sub))
        WHERE crk = 1),
      dt AS (
        SELECT s.vec_id AS query_id, s.sub, c.cent_id,
          CAST(list_dot_product(s.sv, s.sv) + list_dot_product(c.cv, c.cv)
             - 2*list_dot_product(s.sv, c.cv) AS BIGINT) AS dl2
        FROM subs s JOIN cb c USING (sub)
        WHERE s.vec_id < 5),
      sc AS (
        SELECT d.query_id, a.vec_id AS neighbor_id, SUM(d.dl2) AS adc_l2
        FROM asg a JOIN dt d ON d.sub = a.sub AND d.cent_id = a.code
        WHERE a.vec_id <> d.query_id
        GROUP BY 1, 2),
      r AS (
        SELECT query_id, neighbor_id, adc_l2,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_l2, neighbor_id) AS rk
        FROM sc)
      SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id,
        CAST(adc_l2 AS BIGINT) AS adc_l2
      FROM r WHERE rk <= 5
      ORDER BY query_id, rk"""))
  )
}
