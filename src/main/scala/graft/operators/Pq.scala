package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) as a reusable operator:
  * sub-vector slicing, codebook construction (deterministic sample or
  * integer-Lloyd trained), nearest-codeword encoding, and ADC
  * (asymmetric distance computation) retrieval. The `l_ann_pq` /
  * `l_pq_recall` queries delegate here; PqSpec drives the trained
  * path.
  *
  * Everything is integer: vectors ride as round(x·1000) BIGINT, every
  * distance is a sum of squared integer deltas, the codeword argmin is
  * min over the packed long l2·K + cent_id (HashAggregate-friendly —
  * one row per (vector, subspace) on the shuffle, K-way tie-break by
  * codeword id), and the trained-centroid update rounds the exact
  * integer-mean back to BIGINT — so encoding and ranking are
  * bit-reproducible under any partitioning.
  *
  * Scale shape: codebooks are O(M·K) rows and broadcast everywhere;
  * encoding emits the O(n) codes table (M small ints ≈ 8 B/vector —
  * the 32× compression a 100 TB float corpus needs); ADC tables are
  * O(queries·M·K) and broadcast; candidate scoring shuffles only
  * (query, candidate, partial-sum) triples.
  */
object Pq {

  /** Integer squared-L2 between two BIGINT arrays, through the native
    * codegen'd [[graft.functions.L2Sq]] expression — the zip-fold form
    * is CodegenFallback (interpreted lambdas, boxed longs) and
    * dominated PQ encode at corpus×codebook eval counts (r10 probe).
    * Exact: scaled components stay ≤ ~10³, so every squared diff and
    * partial sum is an integer far inside double's exact 2⁵³ range —
    * the long cast returns the bit-identical integer fold result.
    */
  def l2sq(a: Column, b: Column): Column =
    call_function("graft_l2sq", a.cast("array<double>"), b.cast("array<double>"))
      .cast("long")

  /** Scaled-integer vectors: (vec_id, qv: array<long>) from
    * (vec_id, embedding). round(x·1000) at scale 0 — both engines
    * agree at scale 0, so oracle-checked queries share this exactly.
    */
  def scaled(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => round(x * 1000, 0).cast("long")).as("qv"))

  /** One row per (vector, subspace): M contiguous slices of `dims`. */
  def subSlices(e: DataFrame, m: Int = 8, dims: Int = 8): DataFrame =
    e.withColumn("sub", explode(sequence(lit(0L), lit(m - 1L))))
      .withColumn("sv", slice(col("qv"), (col("sub") * dims + 1).cast("int"), lit(dims)))
      .select("vec_id", "sub", "sv")

  /** Deterministic sample codebook: the sub-slices of vectors
    * [offset, offset+k) as codewords 0..k-1.
    */
  def sampleCodebook(subs: DataFrame, k: Int = 16, offset: Int = 0): DataFrame =
    subs.where(col("vec_id") >= offset && col("vec_id") < offset + k)
      .select((col("vec_id") - offset).as("cent_id"), col("sub"), col("sv").as("cv"))

  /** Nearest-codeword encoding: (vec_id, sub, code). The packed-long
    * argmin keeps this in HashAggregate with map-side partials.
    *
    * `k` MUST equal the codebook's codeword count: the packed argmin
    * decodes via pm % k, so a disagreement would silently yield wrong
    * codes — the in-plan assert_true turns that into a loud runtime
    * failure instead. Input-magnitude contract (packed-long range):
    * dims · (2·max|component|)² · k must stay below 2^63; the scaled
    * corpus (|x| ≲ 10^5 after round(x·1000), dims ≤ 64, k ≤ 256) sits
    * at ~10^15, four orders of magnitude under the edge.
    */
  def encode(subs: DataFrame, cb: DataFrame, k: Int = 16): DataFrame =
    subs.join(broadcast(cb), "sub")
      .where(assert_true(col("cent_id") < k,
        lit(s"Pq.encode: codebook has cent_id >= k=$k")).isNull)
      .withColumn("l2", l2sq(col("sv"), col("cv")))
      .groupBy("vec_id", "sub")
      .agg(min(col("l2") * k + col("cent_id")).as("pm"))
      .select(col("vec_id"), col("sub"), (col("pm") % k).as("code"))

  /** [[encode]] with the per-vector argmin fused into the native
    * [[graft.functions.PqEncode]] kernel: takes the UNSLICED scaled
    * vectors (vec_id, qv) and emits the same (vec_id, sub, code) rows.
    *
    * The composed [[encode]] inflates the corpus to n·m·k join rows and
    * pays a (vec, sub)-keyed exchange for the argmin; here the codebook
    * collapses to ONE flattened broadcast row and every vector's m
    * codes ride the scan — zero shuffle, zero aggregate. PqSpec pins
    * the two paths row-identical (same strict-< / lowest-cent tie-break
    * as the packed-long min). The in-plan assert_true keeps the
    * codebook-shape contract loud: a codebook that isn't exactly the
    * dense m·k grid would otherwise misalign the flattened layout.
    */
  def encodeFast(e: DataFrame, cb: DataFrame, m: Int = 8, dims: Int = 8,
      k: Int = 16): DataFrame = {
    val flat = cb
      .groupBy()
      .agg(array_sort(collect_list(struct(col("sub"), col("cent_id"), col("cv"))))
        .as("__sorted"))
      .select(
        flatten(transform(col("__sorted"), s => s.getField("cv"))).as("cbflat"),
        // DENSITY, not just cardinality: a codebook with a duplicated
        // (sub, cent_id) pair and a missing one passes a bare count
        // check yet misaligns the flattened (sub, cent, dim) layout
        // (ADVICE r12). The dense m×k grid is exactly "sorted element
        // i has cent_id in [0, k) and sub·k + cent_id = i" — checked
        // on the ALREADY-collected sorted list, so the plan keeps its
        // single tiny aggregate (a count_distinct here would add a
        // two-stage distinct exchange to every encode, PlanShapeSpec).
        assert_true(
          size(col("__sorted")) === m * k &&
            forall(
              zip_with(col("__sorted"), sequence(lit(0), lit(m * k - 1)), (s, i) =>
                s.getField("cent_id") >= 0 && s.getField("cent_id") < k &&
                  (s.getField("sub") * k + s.getField("cent_id")).cast("long")
                    === i.cast("long")),
              x => x),
          lit(s"Pq.encodeFast: codebook must be the dense $m x $k (sub, cent_id) grid"))
          .as("__ok"))
    e.crossJoin(broadcast(flat))
      // the assert rides INSIDE the generator's child: the generator
      // evaluates it per INPUT row, so a bad codebook fails loudly
      // even though the kernel's null-on-mismatch would otherwise
      // explode into zero output rows (a collapsed post-explode
      // projection never evaluates on an empty generate)
      .select(col("vec_id"),
        posexplode(when(col("__ok").isNull, call_function("graft_pq_encode",
          col("qv"), col("cbflat"), lit(m), lit(dims), lit(k)))))
      .select(col("vec_id"), col("pos").cast("long").as("sub"), col("col").as("code"))
  }

  /** Per-query ADC distance tables (query_id, qsub, cent_id, dl2) for
    * the query vectors selected by `queryPred` on vec_id.
    */
  def adcTables(subs: DataFrame, queryPred: Column, cb: DataFrame): DataFrame =
    subs.where(queryPred)
      .select(col("vec_id").as("query_id"), col("sub").as("qsub"), col("sv").as("qsv"))
      .join(broadcast(cb), col("qsub") === cb("sub"))
      .select(col("query_id"), col("qsub"), col("cent_id"),
        l2sq(col("qsv"), col("cv")).as("dl2"))

  /** ADC retrieval: table-lookup sum per candidate, top-k per query
    * ((query_id, rk, neighbor_id, adc_l2), self excluded).
    */
  def adcTopK(codes: DataFrame, dt: DataFrame, k: Int = 5): DataFrame = {
    val scored = codes
      .join(broadcast(dt), col("sub") === col("qsub") && col("code") === col("cent_id"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum("dl2").as("adc_l2"))
    val rw = Window.partitionBy("query_id").orderBy(col("adc_l2"), col("vec_id"))
    scored.withColumn("rk", row_number().over(rw).cast("long"))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id").as("neighbor_id"), col("adc_l2"))
  }

  /** Integer Lloyd refinement of a codebook, per subspace: assign each
    * sub-vector to its nearest codeword (the same packed-long argmin
    * the encoder uses), recompute each codeword as the rounded mean of
    * its members, repeat. The member sum is an exact LONG sum (never
    * Spark's avg, whose Double sum buffer is accumulation-order-
    * dependent once partials pass 2^53), and the mean is rounded
    * half-away-from-zero in PURE INTEGER arithmetic —
    * (2·|vs| + cn) div (2·cn), sign restored — so there is no FP
    * operation anywhere in training and iterations are bit-identical
    * under any partitioning AND any engine (the `l_ann_pq_trained`
    * oracle replays the same recurrence in SQL). Codewords that lose
    * all members keep their previous value (kmeansRefine's
    * convention). Driver-iterated like Lloyd everywhere; per
    * iteration one broadcast join + one keyed agg over (vector,
    * subspace) rows.
    */
  def trainCodebooks(subs: DataFrame, k: Int = 16, iters: Int = 4,
      initOffset: Int = 0): DataFrame = {
    var cb = sampleCodebook(subs, k, initOffset).localCheckpoint()
    val s = subs.localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = s.join(broadcast(cb), "sub")
        .withColumn("l2", l2sq(col("sv"), col("cv")))
        .groupBy("vec_id", "sub")
        .agg(min(col("l2") * k + col("cent_id")).as("pm"),
          first("sv").as("sv"))
        .select(col("sub"), (col("pm") % k).as("cent_id"), col("sv"))
      val means = assigned
        .select(col("sub"), col("cent_id"), posexplode(col("sv")).as(Seq("dim", "v")))
        .groupBy("sub", "cent_id", "dim")
        .agg(sum("v").as("vs"), count(lit(1)).as("cn"))
        .withColumn("m", when(col("vs") >= 0, expr("(2*vs + cn) div (2*cn)"))
          .otherwise(-expr("(-2*vs + cn) div (2*cn)")))
        .groupBy("sub", "cent_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("sub"), col("cent_id"),
          transform(col("dm"), _.getField("m")).as("cv"))
      cb = cb.as("old")
        .join(means.as("new"), Seq("sub", "cent_id"), "left_outer")
        .select(col("sub"), col("cent_id"),
          coalesce(col("new.cv"), col("old.cv")).as("cv"))
        .localCheckpoint()
    }
    cb
  }

  /** Mean squared quantization error of a codebook over the corpus —
    * the (lower-is-better) quality measure training improves.
    */
  def distortion(subs: DataFrame, cb: DataFrame, k: Int = 16): Double = {
    val best = subs.join(broadcast(cb), "sub")
      .withColumn("l2", l2sq(col("sv"), col("cv")))
      .groupBy("vec_id", "sub")
      .agg(min("l2").as("best"))
    best.agg(avg("best")).head().getDouble(0)
  }
}
