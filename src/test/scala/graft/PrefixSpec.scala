package graft

import graft.operators.Prefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("distributed prefix sum equals the single-partition window") {
    val df = Seq.tabulate(5000)(i => ((i * 2654435761L) % 997, i.toLong, (i % 37) + 1L))
      .toDF("k", "id", "v")
      .repartition(16)
    val dist = Prefix.runningSum(df, Seq(col("k").desc, col("id")), col("v"), "cum")
    val w = Window.orderBy(col("k").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq = df.withColumn("cum", sum("v").over(w))
    assert(dist.exceptAll(seq).isEmpty && seq.exceptAll(dist).isEmpty)
    assert(dist.count() === 5000L)
  }
}
