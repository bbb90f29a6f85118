package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span assembly: turn ordered event streams into span tables.
  *
  * The reference builds thread_spans by replaying begin/end events
  * through a stack (reference: rust/analytics/src/call_tree.rs,
  * span_table.rs). On Spark the same result comes from window
  * functions — a running sum of +1/-1 gives the stack depth, and
  * per-(key, depth) sequence numbers pair each begin with its end.
  * One shuffle on the partition key; no driver-side iteration.
  */
object SpanAssembly {

  /** Consecutive-event spans: each event opens a span that the next
    * event on the same key closes (sessionized span stream).
    */
  def consecutiveSpans(events: DataFrame, keyCol: String, tsMs: Column,
      idCol: String, nameCol: String): DataFrame = {
    events
      .select(col(keyCol), col(idCol), col(nameCol).as("name"), tsMs.as("begin_ms"))
      .withColumn("end_ms", lead(col("begin_ms"), 1).over(
        Window.partitionBy(keyCol).orderBy(col("begin_ms"), col(idCol))))
      .where(col("end_ms").isNotNull)
      .withColumn("duration_ms", col("end_ms") - col("begin_ms"))
  }

  /** Stack-based begin/end pairing with depth, the thread_spans shape.
    *
    * `isBegin` marks opening events. depth(begin) = number of open
    * scopes before it = running sum of deltas exclusive of self; the
    * k-th begin at (key, depth) pairs with the k-th end at that depth.
    */
  def beginEndSpans(events: DataFrame, keyCol: String, tsMs: Column,
      idCol: String, nameCol: String, isBegin: Column): DataFrame = {
    val delta = when(isBegin, lit(1)).otherwise(lit(-1))
    val w = Window.partitionBy(keyCol).orderBy(col("t_ms"), col(idCol))
    val tagged = events.select(
        col(keyCol), col(idCol), col(nameCol).as("name"), tsMs.as("t_ms"),
        isBegin.as("is_begin"), delta.as("delta"))
      .withColumn("post_depth", sum(col("delta")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // begin opens a span at depth = post_depth - 1; end closes one at post_depth
      .withColumn("depth", when(col("is_begin"), col("post_depth") - 1).otherwise(col("post_depth")))
    val seqW = Window.partitionBy(col(keyCol), col("depth"), col("is_begin"))
      .orderBy(col("t_ms"), col(idCol))
    val seqd = tagged.withColumn("seq", row_number().over(seqW))
    // Pair k-th begin with k-th end at (key, depth) by PIVOTING over
    // (key, depth, seq) — each group holds at most one begin and one
    // end (seq is dense per (key, depth, is_begin)), so a conditional
    // aggregate reassembles the pair. The former begins⋈ends self-join
    // was a 100 TB hazard the broadcast audit caught at sf1: both sides
    // sit above a Window, whose size estimate undershoots, so Catalyst
    // statically broadcast the half-corpus `ends` side (83 MB at sf1,
    // growing linearly — and AQE never demotes a static BHJ). The
    // aggregate rides the seq-window's (key, depth, is_begin) exchange
    // with one (key, depth, seq) exchange after it — no join, nothing
    // to mis-broadcast, half the shuffled bytes.
    val paired = seqd.groupBy(col(keyCol), col("depth"), col("seq"))
      .agg(
        max(when(col("is_begin"), col("t_ms"))).as("begin_ms"),
        max(when(!col("is_begin"), col("t_ms"))).as("end_ms"),
        max(when(col("is_begin"), col("name"))).as("name"),
        max(when(col("is_begin"), col(idCol))).as("span_id"))
    paired
      // unpaired begins/ends (malformed streams) have a null side;
      // >= keeps zero-duration spans (begin/end in the same ms) while
      // still dropping mis-ordered pairs from malformed streams
      .where(col("end_ms") >= col("begin_ms"))
      .withColumn("duration_ms", col("end_ms") - col("begin_ms"))
      .select(col(keyCol), col("span_id"), col("name"), col("depth").cast("long").as("depth"),
        col("begin_ms"), col("end_ms"), col("duration_ms"))
  }

  /** Attach each span's enclosing parent (the call-tree linkage the
    * reference materializes in span_table.rs / call_tree.rs): the
    * parent is the latest depth-1-shallower span whose interval encloses
    * the child's. The containment join is bounded per key; a window
    * keeps only the tightest candidate.
    */
  def withParents(spans: DataFrame, keyCol: String,
      carryParentName: Boolean = false): DataFrame = {
    val ch = spans.as("ch")
    // carryParentName rides the elected parent's name through the SAME
    // containment join (one extra string column): consumers that need
    // caller→callee name edges (m_service_graph) then avoid a second
    // spans⋈spans lookup join — the elected row IS the row a
    // (key, parent_id) join would find, span_id being unique per key.
    val par = spans.select(Seq(col(keyCol).as("__pk"), col("span_id").as("parent_id"),
      col("depth").as("__pd"), col("begin_ms").as("__pb"), col("end_ms").as("__pe")) ++
      (if (carryParentName) Seq(col("name").as("__pn")) else Nil): _*)
    val joined = ch.join(par,
      col(s"ch.$keyCol") === col("__pk") &&
        col("__pd") === col("ch.depth") - 1 &&
        col("__pb") <= col("ch.begin_ms") && col("__pe") >= col("ch.end_ms"),
      "left_outer")
    val w = Window.partitionBy(col(s"ch.$keyCol"), col("ch.span_id"))
      .orderBy(col("__pb").desc_nulls_last, col("parent_id").desc_nulls_last)
    joined.withColumn("__rk", row_number().over(w)).where(col("__rk") === 1)
      .select(Seq(col(s"ch.$keyCol"), col("ch.span_id"), coalesce(col("parent_id"), lit(-1L)).as("parent_id"),
        col("ch.name"), col("ch.depth"), col("ch.begin_ms"), col("ch.end_ms"), col("ch.duration_ms")) ++
        (if (carryParentName) Seq(col("__pn").as("parent_name")) else Nil): _*)
  }
}
