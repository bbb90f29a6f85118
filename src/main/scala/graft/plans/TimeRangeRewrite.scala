package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, GreaterThanOrEqual, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Analyzer rule mirroring the reference's TableScanRewrite
  * (reference: rust/analytics/src/lakehouse/table_scan_rewrite.rs):
  * when a session declares a query time range, every scan exposing an
  * event-time column is wrapped in `time >= begin AND time < end` —
  * so ad-hoc queries are automatically range-scoped and the predicate
  * reaches the parquet scan (row-group pruning; partition pruning on a
  * date-partitioned layout).
  *
  * Configure per session (microseconds since epoch, UTC):
  *   spark.conf.set("spark.graft.queryRange.beginMicros", ...)
  *   spark.conf.set("spark.graft.queryRange.endMicros", ...)
  *   spark.conf.set("spark.graft.queryRange.column", "ts")  // default
  *
  * Injected as a resolution rule (GraftExtensions) so the normal
  * optimizer batches push the added Filter into the source afterwards.
  */
case class TimeRangeRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = spark.conf
    val begin = conf.getOption("spark.graft.queryRange.beginMicros").map(_.toLong)
    val end = conf.getOption("spark.graft.queryRange.endMicros").map(_.toLong)
    if (begin.isEmpty && end.isEmpty) return plan
    val colName = conf.getOption("spark.graft.queryRange.column").getOrElse("ts")

    plan.transformUp {
      case leaf: LeafNode if leaf.getTagValue(TimeRangeRewrite.rewritten).isEmpty &&
          timeAttr(leaf, colName).isDefined =>
        leaf.setTagValue(TimeRangeRewrite.rewritten, true)
        val attr = timeAttr(leaf, colName).get
        // raw ns-precision columns surface as Long nanos (nanosAsLong);
        // scale the µs range accordingly so the filter still applies at
        // the scan, beneath any later µs-normalizing projection
        def lit(micros: Long) = attr.dataType match {
          case LongType => Literal(micros * 1000L, LongType)
          case t => Literal(micros, t)
        }
        val conds = begin.map(b => GreaterThanOrEqual(attr, lit(b))).toSeq ++
          end.map(e => LessThan(attr, lit(e)))
        Filter(conds.reduce(And), leaf)
    }
  }

  private def timeAttr(leaf: LeafNode, name: String): Option[Attribute] =
    leaf.output.find(a => a.name == name &&
      (a.dataType == TimestampType || a.dataType == TimestampNTZType ||
        a.dataType == LongType))
}

object TimeRangeRewrite {
  val rewritten: TreeNodeTag[Boolean] = TreeNodeTag[Boolean]("graft.timeRangeRewritten")
}
