package graft

import graft.operators.SpanAssembly
import org.apache.spark.sql.functions._

class SpanAssemblySpec extends SparkSpec {
  import spark.implicits._

  test("consecutive spans pair each event with the next on the key") {
    val df = Seq((1L, 1L, "a", 100L), (1L, 2L, "b", 250L), (1L, 3L, "c", 400L), (2L, 4L, "x", 10L))
      .toDF("k", "id", "name", "t")
    val spans = SpanAssembly.consecutiveSpans(df, "k", col("t"), "id", "name")
      .orderBy("k", "begin_ms").collect()
    assert(spans.length === 2)
    assert(spans.map(_.getAs[Long]("duration_ms")).toSeq === Seq(150L, 150L))
  }

  test("begin/end spans recover a well-nested call tree with depths") {
    // k=1: A(begin t1) { B(t2..t3) } A(end t4), then C(t5..t6)
    val df = Seq(
      (1L, 1L, "A", 10L, true), (1L, 2L, "B", 20L, true), (1L, 3L, "B", 30L, false),
      (1L, 4L, "A", 40L, false), (1L, 5L, "C", 50L, true), (1L, 6L, "C", 60L, false))
      .toDF("k", "id", "name", "t", "is_begin")
    val spans = SpanAssembly.beginEndSpans(df, "k", col("t"), "id", "name", col("is_begin"))
      .orderBy("begin_ms").collect()
    assert(spans.map(r => (r.getAs[String]("name"), r.getAs[Long]("depth"),
      r.getAs[Long]("begin_ms"), r.getAs[Long]("end_ms"))).toSeq ===
      Seq(("A", 0L, 10L, 40L), ("B", 1L, 20L, 30L), ("C", 0L, 50L, 60L)))
  }
}
