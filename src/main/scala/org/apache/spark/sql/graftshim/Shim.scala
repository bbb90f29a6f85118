package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal private[sql] bridge: build a DataFrame from a custom
  * LogicalPlan (`Dataset.ofRows` is package-private). This is the
  * standard technique for Spark extension libraries that introduce
  * their own logical operators.
  */
object Shim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently append a planner strategy to a session we didn't
    * build (driver-owned sessions can't go through withExtensions).
    */
  def addStrategy(spark: SparkSession, strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(strategy)) {
        exp.extraStrategies = exp.extraStrategies :+ strategy
      }
    }
  }
}
