package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Median/MAD robust statistics over keyed count tables — the
  * outlier-immune baseline family (Iglewicz–Hoaglin robust-z lineage):
  * one 10⁶-count burst drags every mean-based baseline (M60/M90) but
  * moves a median not at all. Everything is integer-exact: medians are
  * DOUBLED order statistics (med2 = the sum of the two middle values),
  * so med = med2/2 and MAD = mad4/4 never materialize as floats.
  *
  * Shared by the batch query (`m_log_anomaly_mad`) and the streaming
  * leg ([[graft.streaming.RobustStream]]) so the live alert arithmetic
  * is pinned to the batch formulation.
  */
object Robust {

  /** Dense (name, hour_ms, cnt) grid from a batch (name, hour_ms, cnt)
    * count table: absent hours become zero-count cells — without them a
    * burst next to a dead hour scores against a fantasy baseline. The
    * grid is wall-clock × names bounded, never volume-bounded. Input is
    * expected to be pre-aggregated (and cheap to re-read — checkpoint
    * it upstream if its lineage is expensive).
    */
  def denseHourly(hourly: DataFrame): DataFrame = {
    val bounds = hourly.agg(min("hour_ms").as("lo"), max("hour_ms").as("hi"))
    val grid = bounds
      .select(explode(sequence(col("lo"), col("hi"), lit(3600000L))).as("hour_ms"))
      .crossJoin(hourly.select("name").distinct())
    grid.join(hourly, Seq("name", "hour_ms"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
  }

  /** (name, med2, mad4) over a dense (name, hour_ms, cnt) grid:
    * med2 = 2·median(cnt), mad4 = 4·MAD(cnt) = 2·median(|2·cnt − med2|).
    * Rank windows are keyed per name and ride the wall-clock grid.
    */
  def madBaseline(dense: DataFrame): DataFrame = {
    val wN = Window.partitionBy("name")
    def med2Of(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val r = df
        .withColumn("rk", row_number().over(wN.orderBy(col(valueCol), col("hour_ms"))))
        .withColumn("n", count(lit(1)).over(wN))
      r.groupBy("name").agg(
          sum(when(col("rk") === expr("(n + 1) div 2"), col(valueCol)).otherwise(0L)).as("lo"),
          sum(when(col("rk") === expr("(n + 2) div 2"), col(valueCol)).otherwise(0L)).as("hi"))
        .withColumn(out, col("lo") + col("hi"))
        .select("name", out)
    }
    val med = med2Of(dense, "cnt", "med2")
    val dev = dense.join(broadcast(med), "name")
      .withColumn("dev2", abs(col("cnt") * 2 - col("med2")))
    med.join(med2Of(dev, "dev2", "mad4"), "name")
  }

  /** Robust-z score e4 over columns named (cnt, med2, mad4):
    * (|2·cnt − med2|·2)·10⁴ div max(mad4, 1) = (|cnt − med|/MAD) e4.
    * Kept as a SQL fragment (not Column arithmetic) because Spark's
    * Column `/` on longs is DOUBLE division — `div` is the exact form
    * both engines share.
    */
  val scoreE4Sql: String = "abs(cnt * 2 - med2) * 2 * 10000 div greatest(mad4, 1)"
}
