package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Pins the distributed BPE merge to an independent in-memory
  * implementation (the classic sequential formulation), so the
  * gaps-and-islands parity trick can't silently drift from true
  * greedy left-to-right semantics.
  */
class BpeSpec extends SparkSpec {

  // sequential reference: one greedy left-to-right merge pass
  private def mergeSeq(tokens: List[String], w1: String, w2: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < tokens.length) {
      if (i + 1 < tokens.length && tokens(i) == w1 && tokens(i + 1) == w2) {
        out += s"${w1}_$w2"; i += 2
      } else { out += tokens(i); i += 1 }
    }
    out.toList
  }

  private def trainSeq(docs: Map[Long, List[String]], rounds: Int)
      : (Map[Long, List[String]], Seq[(String, String, Long)]) = {
    var cur = docs
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until rounds) {
      val counts = cur.values.flatMap(t => t.zip(t.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (counts.nonEmpty) {
        val ((w1, w2), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((w1, w2, n))
        cur = cur.view.mapValues(mergeSeq(_, w1, w2)).toMap
      }
    }
    (cur, merges.result())
  }

  test("three distributed merge rounds equal the sequential reference") {
    val docs = Tables.df(spark, sfDir, "documents").limit(60).cache()
    val inMem: Map[Long, List[String]] = docs.collect().map { r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text").trim.split("\\s+").toList
    }.toMap

    val (tokDf, merges) = Bpe.train(docs, "text", rounds = 3)
    val (seqDocs, seqMerges) = trainSeq(inMem, 3)

    assert(merges.map(m => (m.w1, m.w2, m.count)) == seqMerges,
      "merge choices (pair + count) must match the sequential reference")

    val got: Map[Long, List[String]] = tokDf
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")), " ").as("txt"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("txt").split(" ").toList)
      .toMap
    assert(got == seqDocs, "merged token streams must match")
    docs.unpersist()
  }

  test("edge cases: overlapping runs merge greedily, boundaries respected") {
    // a a a  -> [a_a, a];  a a a a -> [a_a, a_a];  b a a b -> [b, a_a, b]
    import spark.implicits._
    val df = Seq((0L, "a a a"), (1L, "a a a a"), (2L, "b a a b"), (3L, "a b a b"))
      .toDF("doc_id", "text")
    val tok = Bpe.tokens(df, "text")
    // (a,a) occurrences: 2 in doc0 + 3 in doc1 + 1 in doc2 = 6
    assert(Bpe.topPair(tok).contains(Bpe.Merge("a", "a", 6)))
    val merged = Bpe.applyMerge(tok, Bpe.Merge("a", "a", 6))
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")), " ").as("txt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == Map(0L -> "a_a a", 1L -> "a_a a_a", 2L -> "b a_a b", 3L -> "a b a b"))
  }

  test("vocabulary shrinks monotonically across rounds") {
    val docs = Tables.df(spark, sfDir, "documents").limit(40)
    var tok = Bpe.tokens(docs, "text")
    val sizes = scala.collection.mutable.ArrayBuffer(tok.count())
    for (_ <- 1 to 2) {
      val m = Bpe.topPair(tok).get
      tok = Bpe.applyMerge(tok, m)
      sizes += tok.count()
      // overlapping runs merge fewer than pair_n occurrences, but
      // every round with a winning pair strictly shrinks the stream
      assert(sizes(sizes.length - 2) - sizes.last > 0)
    }
  }
}
