package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._

/** Drives the PQ operator beyond the oracle-checked sample-codebook
  * queries: the trained-codebook quality path, encoding determinism,
  * and the recall comparison that closes the loop on `l_pq_recall`'s
  * honest low number — training the codebooks must not make the index
  * worse, and distortion (the thing Lloyd minimizes) must strictly
  * improve.
  */
class PqSpec extends SparkSpec {

  private def subs = {
    val e = Pq.scaled(Tables.df(spark, "/root/testdata/sf0.01", "embeddings"))
    Pq.subSlices(e)
  }

  test("integer Lloyd training strictly reduces quantization distortion") {
    val s = subs.localCheckpoint()
    val sampled = Pq.sampleCodebook(s)
    val trained = Pq.trainCodebooks(s, iters = 4)
    val d0 = Pq.distortion(s, sampled)
    val d1 = Pq.distortion(s, trained)
    assert(d1 < d0, s"training did not reduce distortion: $d0 -> $d1")
    // and meaningfully so — Lloyd on a 500-vector corpus with K=16
    // should cut MSE well below the arbitrary-sample baseline
    assert(d1 < d0 * 0.9, s"distortion reduction too weak: $d0 -> $d1")
  }

  test("training is bit-deterministic across DIFFERENT partitionings") {
    // the second run consumes a reshuffled copy: if any accumulation
    // were FP-order-dependent (e.g. avg's Double sum buffer), the
    // codebooks would diverge — the exact-long-sum contract is what
    // this pins, not mere same-layout repeatability
    val s = subs.localCheckpoint()
    val a = Pq.trainCodebooks(s, iters = 3).orderBy("sub", "cent_id").collect()
    val b = Pq.trainCodebooks(s.repartition(13, col("sub")), iters = 3)
      .orderBy("sub", "cent_id").collect()
    assert(a.sameElements(b), "integer Lloyd diverged across partitionings")
  }

  test("trained codebooks do not hurt recall vs the sample baseline") {
    val s = subs.localCheckpoint()
    val queryPred = col("vec_id") < 20 // more queries than the oracle's 5 → stabler count
    def recallAt10(cb: org.apache.spark.sql.DataFrame): Long = {
      val approx = Pq.adcTopK(Pq.encode(s, cb), Pq.adcTables(s, queryPred, cb), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      exact10.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
    }
    val sampled = recallAt10(Pq.sampleCodebook(s))
    val trained = recallAt10(Pq.trainCodebooks(s, iters = 4))
    assert(trained >= sampled,
      s"trained codebooks recovered fewer exact neighbors: $sampled -> $trained")
  }

  test("trained IVFADC structures: each quantization stage improves on its sample init") {
    // the full trained index structure, stage by stage. Coarse
    // centroids are trainCodebooks with ONE subspace spanning the
    // whole vector (m=1, dims=64) — the same integer-Lloyd machinery
    // serves both quantizers.
    val e = Pq.scaled(Tables.df(spark, "/root/testdata/sf0.01", "embeddings"))
      .localCheckpoint()
    val whole = Pq.subSlices(e, m = 1, dims = 64).localCheckpoint()
    val coarse0 = Pq.sampleCodebook(whole, k = 16)
    val coarse1 = Pq.trainCodebooks(whole, k = 16, iters = 4)
    val cd0 = Pq.distortion(whole, coarse0, k = 16)
    val cd1 = Pq.distortion(whole, coarse1, k = 16)
    assert(cd1 < cd0, s"trained coarse centroids did not improve: $cd0 -> $cd1")

    // residuals under the TRAINED coarse assignment; residual PQ
    // codebooks trained on the same input must beat their sample init
    val asg = Pq.encode(whole, coarse1, k = 16)
      .select(col("vec_id"), col("code"))
    val resid = e.join(asg, "vec_id")
      .join(broadcast(coarse1.select(col("cent_id").as("code"), col("cv"))), "code")
      .select(col("vec_id"), zip_with(col("qv"), col("cv"), (a, b) => a - b).as("qv"))
    val rsubs = Pq.subSlices(resid).localCheckpoint()
    val rd0 = Pq.distortion(rsubs, Pq.sampleCodebook(rsubs, k = 16, offset = 16))
    val rd1 = Pq.distortion(rsubs, Pq.trainCodebooks(rsubs, k = 16, iters = 4, initOffset = 16))
    assert(rd1 < rd0, s"trained residual codebooks did not improve: $rd0 -> $rd1")
  }

  test("served trained+refine path recovers >= 3/5 exact neighbors (median) at sf0.1") {
    // the recall floor for what l_ann_pq_trained actually serves:
    // integer-Lloyd codebooks (2 iters), ADC shortlist of 100, exact
    // integer-L2 re-rank — measured at the 10× SF. The whole pipeline
    // is bit-deterministic, so this is a fixed property of the index
    // on this corpus, not a flaky statistical bound (measured: per-
    // query recall 4,4,5,5,3 → median 4).
    val e = Pq.scaled(Tables.df(spark, "/root/testdata/sf0.1", "embeddings"))
      .localCheckpoint()
    val s = Pq.subSlices(e).localCheckpoint()
    val qs = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("el2"), col("vec_id"))
    val exact5 = e.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("el2", Pq.l2sq(col("qv"), col("qqv")))
      .withColumn("erk", row_number().over(w)).where(col("erk") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val cb = Pq.trainCodebooks(s, iters = 2)
    val short = Pq.adcTopK(Pq.encode(s, cb),
      Pq.adcTables(s, col("vec_id") < 5, cb), k = 100)
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("el2"), col("neighbor_id"))
    val served = short.select("query_id", "neighbor_id")
      .join(e, col("neighbor_id") === col("vec_id"))
      .join(broadcast(qs), "query_id")
      .withColumn("el2", Pq.l2sq(col("qv"), col("qqv")))
      .withColumn("rk", row_number().over(rw)).where(col("rk") <= 5)
      .select(col("query_id"), col("neighbor_id"))
    val perQuery = exact5.join(served, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1)).sorted
    assert(perQuery.length == 5, s"expected 5 queries, got ${perQuery.toSeq}")
    val median = perQuery(2)
    assert(median >= 3, s"recall@5 median $median < 3 (per-query: ${perQuery.toSeq})")
  }

  /** Exact integer-L2 top-10 over the full vectors for vec_id < 20. */
  private lazy val exact10 = {
    val e = Pq.scaled(Tables.df(spark, "/root/testdata/sf0.01", "embeddings"))
      .localCheckpoint()
    val qs = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("el2"), col("vec_id"))
    e.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("el2", Pq.l2sq(col("qv"), col("qqv")))
      .withColumn("erk", row_number().over(w))
      .where(col("erk") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .localCheckpoint()
  }
  test("encodeFast kernel == composed encode, sample and trained codebooks") {
    // the r12 fused kernel must reproduce the packed-long argmin
    // row-for-row — including ties (lowest cent_id) and the dense
    // m·k codebook-shape contract. Checked on BOTH codebook
    // constructors so a layout drift in the flatten ordering
    // (sub, cent_id, dim) cannot hide behind one of them.
    val e = Pq.scaled(Tables.df(spark, "/root/testdata/sf0.01", "embeddings"))
      .localCheckpoint()
    val s = Pq.subSlices(e).localCheckpoint()
    for (cb <- Seq(Pq.sampleCodebook(s), Pq.trainCodebooks(s, iters = 2))) {
      val slow = Pq.encode(s, cb).orderBy("vec_id", "sub").collect()
      val fast = Pq.encodeFast(e, cb).orderBy("vec_id", "sub").collect()
      assert(slow.length == fast.length)
      assert(slow.zip(fast).forall { case (a, b) =>
        a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
          a.getLong(2) == b.getLong(2)
      }, "fused PQ encoding diverged from the composed argmin")
    }
  }

  test("encodeFast refuses a non-dense codebook loudly") {
    val e = Pq.scaled(Tables.df(spark, "/root/testdata/sf0.01", "embeddings"))
    val s = Pq.subSlices(e)
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    def expectShapeAssert(cb: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val ex = intercept[Exception] { Pq.encodeFast(e, cb).count() }
      assert(chain(ex).exists(t => t.getMessage != null &&
        t.getMessage.contains("dense")),
        s"expected the codebook-shape assert for $what, got: ${ex.getMessage}")
    }
    // missing codeword: wrong cardinality
    expectShapeAssert(Pq.sampleCodebook(s).where(col("cent_id") =!= 7), "a hole")
    // duplicated (sub, cent_id) pair REPLACING a missing one: the
    // cardinality check alone passes (count == m·k) while the
    // flattened layout misaligns — the density assert must fire
    // (ADVICE r12)
    val base = Pq.sampleCodebook(s)
    val dup = base.where(col("cent_id") =!= 7)
      .union(base.where(col("cent_id") === 3))
    expectShapeAssert(dup, "a duplicate pair")
  }

}
