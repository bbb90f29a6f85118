package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.Shim

/** Native backward as-of join as a first-class Catalyst operator:
  * custom LogicalPlan + SparkStrategy + BinaryExecNode.
  *
  * Semantics (same as [[graft.operators.AsofJoin]], the composed
  * window formulation, and DuckDB/QuestDB `ASOF JOIN`): for each left
  * row, the single right row with the same key and the largest
  * `rightTime <= leftTime` (inclusive; ties on time resolved by right
  * sort order, i.e. the last one). Left rows with no match get nulls.
  *
  * Execution model — built for the 100 TB case:
  *  - `requiredChildDistribution` co-partitions both sides by key
  *    (EnsureRequirements inserts the shuffles, AQE sizes them);
  *  - `requiredChildOrdering` asks for (key, time) sort within
  *    partitions (SortExec, spillable);
  *  - the join itself is a per-partition streaming merge: O(n+m) per
  *    partition, O(1) state (ONE buffered right row), no row buffering
  *    of either side — where the window formulation materializes the
  *    unioned stream per key in the window operator, this holds only
  *    the current carry row. Output preserves the left side's
  *    partitioning and ordering, so downstream keyed work reuses the
  *    exchange.
  *
  * Reference analog: micromegas pairs measures onto log/span rows by
  * time proximity (doc/how_to_query/README.md); DataFusion has no
  * as-of operator either — this is the Spark-native re-expression.
  */
object AsofJoinNative {

  /** Backward as-of join `left` with `right` on equal `key`, matching
    * the latest right row at-or-before the left row's time.
    * Right columns are suffixed with `rightSuffix` when they collide
    * with left names. Both time columns must have the same type.
    */
  def join(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTime: String, rightTime: String, rightSuffix: String = "_r"): DataFrame = {
    val spark = left.sparkSession
    Shim.addStrategy(spark, AsofJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    // de-collide right column names BEFORE analysis capture so the
    // operator's output attribute names are unambiguous
    val leftNames = left.columns.toSet
    val renamed = right.columns.foldLeft(right) { (df, c) =>
      if (leftNames.contains(c)) df.withColumnRenamed(c, c + rightSuffix) else df
    }
    val rPlan = renamed.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lKeys = key.map(attr(lPlan, _))
    val rKeys = key.map(k => attr(rPlan,
      if (leftNames.contains(k)) k + rightSuffix else k))
    val lT = attr(lPlan, leftTime)
    val rT = attr(rPlan,
      if (leftNames.contains(rightTime)) rightTime + rightSuffix else rightTime)
    require(lT.dataType == rT.dataType,
      s"time column types differ: ${lT.dataType} vs ${rT.dataType}")
    Shim.ofRows(spark, AsofJoinNode(lPlan, rPlan, lKeys, rKeys, lT, rT))
  }
}

/** Logical operator: output = left columns ++ right columns (right made
  * nullable — unmatched left rows carry nulls).
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(a => a.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical streaming merge as-of join. Children arrive co-partitioned
  * by key and sorted by (key, time) — EnsureRequirements materializes
  * that from the declared requirements below.
  */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(a => a.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // the merge consumes the left side in order and emits 1:1
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeRef = BindReferences.bindReference(leftTime: Expression, left.output)
      val rTimeRef = BindReferences.bindReference(rightTime: Expression, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
        .asInstanceOf[Ordering[Any]]
      val nullRight = new GenericInternalRow(right.output.size)
      val joined = new JoinedRow
      // bind against nullable-forced right attributes: binding the raw
      // (non-nullable) child attrs would compile away the null checks
      // and read garbage zeros for unmatched rows
      val result = UnsafeProjection.create(output,
        left.output ++ right.output.map(_.withNullability(true)))

      val rBuf = rIt.buffered
      // carry state: the latest qualifying right row and its key — O(1)
      var carry: InternalRow = null
      var carryKey: UnsafeRow = null

      lIt.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeVal = lTimeRef.eval(lRow)
        if (lKey.anyNull || lTimeVal == null) {
          result(joined(lRow, nullRight))
        } else {
          // drop carry from an earlier key group
          if (carry != null && keyOrd.compare(carryKey, lKey) != 0) {
            carry = null; carryKey = null
          }
          // advance right while it is (smaller key) or (same key,
          // time <= left time); the last qualifying row wins. Each
          // qualifying row is copied as it is consumed — the sort
          // iterator REUSES its UnsafeRow, so any peek-ahead would
          // mutate a row held by reference. Every right row is copied
          // at most once over the whole partition (pointer only moves
          // forward), so this stays O(m) total.
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rHead = rBuf.head
            val rKey = rKeyProj(rHead)
            val kc = if (rKey.anyNull) -1 else keyOrd.compare(rKey, lKey)
            if (kc < 0) { rBuf.next(); () } // behind: discard (incl. null keys)
            else if (kc == 0) {
              val rTimeVal = rTimeRef.eval(rHead)
              if (rTimeVal == null) { rBuf.next(); () } // unusable
              else if (timeOrd.compare(rTimeVal, lTimeVal) <= 0) {
                carry = rBuf.next().copy()
                if (carryKey == null || keyOrd.compare(carryKey, lKey) != 0) {
                  carryKey = lKey.copy() // kc == 0: right key == left key
                }
              } else advancing = false // same key, future time: stop
            } else advancing = false // right is ahead: stop
          }
          result(joined(lRow, if (carry != null) carry else nullRight))
        }
      }
    }
  }
}
