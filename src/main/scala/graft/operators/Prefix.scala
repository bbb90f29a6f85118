package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running totals (prefix sums) over a global order.
  *
  * A bare `Window.orderBy(...)` with no partition key collapses the
  * whole dataset into ONE task — correct, and fine for small curated
  * sets, but a non-starter at scale. This is the classic two-pass
  * shape instead: range-partition by the global order (each partition
  * holds a contiguous order slice), windowed running sum WITHIN each
  * partition, then add each partition's starting offset — the only
  * driver-side data is one subtotal per partition (like broadcasting
  * k centroids), everything else stays distributed.
  */
object Prefix {

  /** Append `out` = running sum of integral `value` over the global
    * order given by `order` (use `.desc`/`.asc` columns; include a
    * tiebreaker for determinism).
    */
  def runningSum(df: DataFrame, order: Seq[Column], value: Column, out: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__local", sum(value).over(w)).localCheckpoint()
    val totals = local.groupBy("__pid").agg(sum(value).as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) => (pid, acc + tot) }
      .init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    local.join(broadcast(offDf), Seq("__pid"))
      .withColumn(out, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }
}
