package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._

/** Pins the distributed PQ operator to an independent SEQUENTIAL
  * implementation (the BpeSpec convention): for seeded pseudo-random
  * corpora, encoding, ADC tables and the final ranking must agree
  * exactly — including tie-breaks. The reference implementation below
  * shares no code with [[Pq]]; it is the few-line textbook loop.
  */
class PqPropSpec extends SparkSpec {

  private val M = 4     // subspaces
  private val D = 4     // dims per subspace
  private val K = 4     // codewords per subspace
  private val TOPK = 3

  /** Textbook PQ, sequentially: returns (codes, topk) where codes is
    * vec -> per-subspace codeword ids and topk is query -> ranked
    * (neighbor, dist) with (dist, neighbor) tie-break.
    */
  private def sequentialPq(vecs: Map[Long, Array[Long]], queryIds: Seq[Long])
      : (Map[(Long, Int), Int], Map[Long, Seq[(Long, Long)]]) = {
    def sub(v: Array[Long], s: Int): Array[Long] = v.slice(s * D, s * D + D)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val codebook: Map[(Int, Int), Array[Long]] = // (sub, cent) -> codeword
      (for (s <- 0 until M; c <- 0 until K) yield (s, c) -> sub(vecs(c.toLong), s)).toMap
    val codes = (for ((id, v) <- vecs.toSeq; s <- 0 until M) yield {
      val best = (0 until K).minBy(c => (l2(sub(v, s), codebook(s -> c)), c))
      (id, s) -> best
    }).toMap
    val topk = queryIds.map { q =>
      val scored = vecs.keys.filter(_ != q).toSeq.map { n =>
        val d = (0 until M).map(s => l2(sub(vecs(q), s), codebook(s -> codes(n -> s)))).sum
        (n, d)
      }
      q -> scored.sortBy { case (n, d) => (d, n) }.take(TOPK)
    }.toMap
    (codes, topk)
  }

  test("distributed PQ == sequential reference on seeded random corpora") {
    import spark.implicits._
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(20)
      val vecs: Map[Long, Array[Long]] =
        (0L until n).map(i => i -> Array.fill(M * D)(rnd.nextInt(2001) - 1000L)).toMap
      val queryIds = (0L until 3L).toSeq

      val e = vecs.toSeq.sortBy(_._1).map { case (id, v) => (id, v.toSeq) }
        .toDF("vec_id", "qv")
      val subs = Pq.subSlices(e, m = M, dims = D)
      val cb = Pq.sampleCodebook(subs, k = K)
      val codes = Pq.encode(subs, cb, k = K)
      val dt = Pq.adcTables(subs, col("vec_id") < 3, cb)
      val ranked = Pq.adcTopK(codes, dt, k = TOPK)

      val (seqCodes, seqTop) = sequentialPq(vecs, queryIds)

      val gotCodes = codes.collect()
        .map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2).toInt).toMap
      assert(gotCodes == seqCodes, s"seed=$seed: encoding diverged")

      val gotTop = ranked.collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) =>
          q -> rows.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq
        }
      assert(gotTop == seqTop, s"seed=$seed: ADC ranking diverged")
    }
  }
}
