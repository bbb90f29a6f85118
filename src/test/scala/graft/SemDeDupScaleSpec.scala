package graft

import graft.operators.{Ann, SemDeDup}
import org.apache.spark.sql.functions._

/** The SemDeDup scale path: K as a parameter (the oracle gate pins
  * K=8 for determinism; real corpora need K ∝ n/target_cluster_size so
  * the within-cluster pairwise term stays bounded), and trained
  * centroids via Ann.kmeansRefine feeding the same integer-assignment
  * machinery.
  */
class SemDeDupScaleSpec extends SparkSpec {

  // the big local corpus: sf0.1 embeddings
  private def embs = Tables.df(spark, "/root/testdata/sf0.1", "embeddings")

  test("K=64 on sf0.1: all vectors assigned, pairwise work bounded well below all-pairs") {
    val asn = SemDeDup.assignments(embs, 64).cache()
    try {
      val n = embs.count()
      assert(asn.count() === n, "every vector gets exactly one cluster")
      assert(asn.where(col("cluster") < 0 || col("cluster") >= 64).count() === 0)

      // the quadratic bound: Σ size·(size−1)/2 must be far below the
      // all-pairs n·(n−1)/2 — this is WHY SemDeDup clusters first, and
      // what growing K buys at scale
      val sizes = asn.groupBy("cluster").agg(count(lit(1)).as("sz"))
      val pairCount = sizes.agg(sum(col("sz") * (col("sz") - 1) / 2)).head().getDouble(0)
      val allPairs = n.toDouble * (n - 1) / 2
      assert(pairCount < allPairs / 8,
        f"per-cluster pairs $pairCount%.0f should be <1/8 of all-pairs $allPairs%.0f")

      // dedup over the K=64 assignment behaves: keeps a subset, never
      // invents rows, and keeps at least one survivor per cluster
      val kept = SemDeDup.dedup(asn, 0.4).cache()
      try {
        assert(kept.count() > 0 && kept.count() <= n)
        assert(kept.join(asn, Seq("vec_id", "cluster"), "left_anti").count() === 0)
        val clustersIn = asn.select("cluster").distinct().count()
        val clustersOut = kept.select("cluster").distinct().count()
        assert(clustersOut === clustersIn, "dedup never empties a cluster (earliest id always survives)")
      } finally kept.unpersist()
    } finally asn.unpersist()
  }

  test("trained centroids (kmeansRefine) quantize into the same integer assignment path") {
    // train on sf0.001 (the sample), assign the same corpus through the
    // quantized trained centroids — the 100 TB shape: train on a
    // sample, broadcast quantized centroids, integer-assign the corpus
    val small = Tables.df(spark, sfDir, "embeddings")
    val trained = Ann.kmeansRefine(small, 16, 2)
    val cents = SemDeDup.quantizeVecs(trained, "cent_id", "ce")
    assert(cents.count() === 16)
    val asn = SemDeDup.assign(SemDeDup.quantize(small), cents).cache()
    try {
      assert(asn.count() === small.count())
      // trained centroids must not be WORSE than the first-16-vectors
      // sample at concentrating mass (lower total integer distortion)
      val sampleAsn = SemDeDup.assignments(small, 16)
      val trainedDist = asn.agg(sum("idist")).head().getLong(0)
      val sampleDist = sampleAsn.agg(sum("idist")).head().getLong(0)
      assert(trainedDist <= sampleDist,
        s"trained centroids should not increase total distortion ($trainedDist vs $sampleDist)")
      // and the dedup pass runs unchanged on the trained assignment
      val kept = SemDeDup.dedup(asn, 0.4)
      assert(kept.count() > 0 && kept.count() <= small.count())
    } finally asn.unpersist()
  }
}
