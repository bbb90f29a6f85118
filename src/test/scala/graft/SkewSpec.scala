package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of rows share one hot key
    val large = (1 to 2000).map(i => (if (i % 10 == 0) i % 5 else 1, i.toLong)).toDF("k", "v")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e")).toDF("k", "name")
    val plain = large.join(small, "k").agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(large, small, "k", col("v"), 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(plain === salted)
  }
}
