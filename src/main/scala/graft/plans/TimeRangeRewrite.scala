package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, GreaterThanOrEqual, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
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
  *
  * Idempotency is structural, not stateful: a scan already sitting
  * directly under a Filter whose condition semantically contains the
  * range conjunct is left alone. (A mutable TreeNodeTag guard would be
  * one-shot per shared plan instance — a self-join expanding the same
  * view twice, or a re-analyzed cached plan, would silently lose the
  * range on later encounters.)
  */
case class TimeRangeRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = spark.conf
    // thread-local range (per-query, set by Graft.query) wins; session
    // conf remains as a static configuration channel
    val (tlBegin, tlEnd) = QueryRange.get
    val begin = tlBegin.orElse(conf.getOption("spark.graft.queryRange.beginMicros").map(_.toLong))
    val end = tlEnd.orElse(conf.getOption("spark.graft.queryRange.endMicros").map(_.toLong))
    if (begin.isEmpty && end.isEmpty) return plan
    val colName = conf.getOption("spark.graft.queryRange.column").getOrElse("ts")
    // Unit of a LongType time column. Not every Long named `ts` is epoch
    // nanos, so scaling is gated: explicit conf wins; otherwise nanos is
    // assumed ONLY when the session reads ns parquet as Long
    // (spark.sql.legacy.parquet.nanosAsLong — the one way our readers
    // produce a Long time column), else the column is taken as epoch
    // micros (no scaling).
    val longUnit = conf.getOption("spark.graft.queryRange.columnUnit").getOrElse {
      if (conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")) "nanos"
      else "micros"
    }

    def condFor(attr: Attribute): Expression = {
      def lit(micros: Long) = attr.dataType match {
        case LongType => longUnit match {
          case "nanos" => Literal(micros * 1000L, LongType)
          case "millis" => Literal(micros / 1000L, LongType)
          case "micros" => Literal(micros, LongType)
          case other => throw new IllegalArgumentException(
            s"spark.graft.queryRange.columnUnit must be nanos|micros|millis, got $other")
        }
        case t => Literal(micros, t)
      }
      val conds = begin.map(b => GreaterThanOrEqual(attr, lit(b))).toSeq ++
        end.map(e => LessThan(attr, lit(e)))
      conds.reduce(And)
    }

    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }

    def alreadyScoped(cond: Expression, attr: Attribute): Boolean = {
      val want = conjuncts(condFor(attr))
      val have = conjuncts(cond)
      want.forall(w => have.exists(_.semanticEquals(w)))
    }

    def inject(p: LogicalPlan): LogicalPlan = p match {
      case f @ Filter(cond, leaf: LeafNode)
          if timeAttr(leaf, colName).exists(a => alreadyScoped(cond, a)) => f
      case leaf: LeafNode if timeAttr(leaf, colName).isDefined =>
        Filter(condFor(timeAttr(leaf, colName).get), leaf)
      case other => other.mapChildren(inject)
    }
    inject(plan)
  }

  private def timeAttr(leaf: LeafNode, name: String): Option[Attribute] =
    leaf.output.find(a => a.name == name &&
      (a.dataType == TimestampType || a.dataType == TimestampNTZType ||
        a.dataType == LongType))
}
