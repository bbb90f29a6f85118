package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the latest right row with
  * `right.time <= left.time` on the same key — "the measure value in
  * effect when this log line fired", the metric/event alignment
  * primitive of observability analysis (DuckDB/QuestDB ship it as
  * ASOF JOIN; Spark has no built-in).
  *
  * Spark-first shape: instead of a per-left-row range probe (O(n·m))
  * or an inequality join (Catalyst would nested-loop it), both sides
  * union into one stream, sorted per key by (time, side, seq); a
  * running `last(ignoreNulls)` window carries each right value forward
  * until the next right row. One shuffle on the key, linear work,
  * partial-agg-free — the classic log-merge formulation, AQE-safe and
  * skew-splittable. Right rows sort before left rows at equal times,
  * so the match is inclusive (<=); among equal-time right rows the
  * largest seq wins (deterministic).
  */
object AsofJoin {

  /** @param rightVals right columns to carry onto left rows (nullable
    *                   until a right row has been seen for the key)
    * @param leftSeq    unique-per-key tiebreaker column on the left
    * @param rightSeq   unique-per-key tiebreaker column on the right
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: Column, rightTime: Column, rightVals: Seq[String],
      leftSeq: Column, rightSeq: Column): DataFrame = {
    val leftCols = left.columns.toSeq
    // The right payload travels as ONE nullable struct, so every carried
    // field comes from the SAME matched row. Carrying columns
    // independently with last(ignoreNulls) would stitch values from
    // different right rows whenever a matched row holds a null field —
    // a row that never existed.
    val l = left.select(
      col(key) +: leftCols.filter(_ != key).map(col) :+
        leftTime.as("__t") :+ lit(1).as("__side") :+ leftSeq.as("__seq") :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightVals.map(v => org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)))
        ).as("__r"): _*)
    val r = right.select(
      col(key) +: leftCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rightTime.as("__t") :+ lit(0).as("__side") :+ rightSeq.as("__seq") :+
        struct(rightVals.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    carried.where(col("__side") === 1)
      .select(col(key) +: leftCols.filter(_ != key).map(col) ++:
        rightVals.map(v => col(s"__m.$v").as(v)): _*)
  }
}
