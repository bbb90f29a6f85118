package graft

import org.apache.spark.sql.functions._

/** Spill-budget coverage — the reference's
  * `MICROMEGAS_DATAFUSION_MAX_TEMP_DIRECTORY_MB` analog
  * (CHANGELOG.md:11, mkdocs/docs/admin/flight-sql.md:34): a
  * process-wide cap on spill bytes across all concurrent queries,
  * where exceeding it fails whichever query pushed past the cap,
  * classified `resource_exhausted` (M87's "resource" class).
  */
class SpillBudgetSpec extends SparkSpec {

  /** A query whose window buffers are forced to disk regardless of
    * heap pressure: the spill thresholds make every window group
    * buffer overflow to UnsafeExternalSorter, which records
    * diskBytesSpilled in the task metrics the budget listens to.
    * `parts` controls the task count — the explicit repartition on the
    * window key already satisfies the window's distribution, so the
    * window stage runs `parts` tasks; on local[4] that is parts/4
    * waves, and the cancel lands while later waves are still queued.
    */
  private def spillingCount(parts: Int): Long = {
    val grp = pmod(col("event_id"), lit(parts))
    val df = spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(parts, grp)
      .withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(grp).orderBy(col("event_id"))))
    df.where(col("rnk") > 0).count()
  }

  /** Listener-bus dispatch is async; poll instead of reaching into the
    * private[spark] bus.
    */
  private def awaitListener(cond: => Boolean, timeoutMs: Long = 30000): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(20)
    assert(cond, "listener did not observe the expected state in time")
  }

  private def withSpillForced[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.windowExec.buffer.spill.threshold")
    val old = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    keys.foreach(k => spark.conf.set(k, "4"))
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("accounting core: per-execution attribution, process-wide cap, one cancel set") {
    val b = SpillBudget.attach(spark, 100L)
    try {
      // two concurrent executions sharing the budget
      b.handleJobStart(1, Some("A"), Seq(10, 11))
      b.handleJobStart(2, Some("A"), Seq(12))
      b.handleJobStart(3, Some("B"), Seq(20))
      // non-SQL job: outside the budget entirely
      b.handleJobStart(4, None, Seq(30))

      assert(b.handleTaskEnd(10, 60L) === Nil, "under budget")
      assert(b.handleTaskEnd(30, 1000000L) === Nil, "non-SQL spill never counts")
      assert(b.outstanding.get() === 60L)
      // B's task pushes the SHARED total past the cap → B is the
      // victim (whichever query pushed past, not the biggest spender)
      assert(b.handleTaskEnd(20, 60L) === Seq(3))
      assert(b.cancelCount.get() === 1L)
      // already-cancelled execution never yields a second victim set
      assert(b.handleTaskEnd(20, 5L) === Nil)
      // A survives B's cancellation; its own next spill now crosses
      // the cap too (outstanding still includes B until B's
      // execution-end event) → A's ACTIVE jobs are the victims
      b.handleJobEnd(2)
      assert(b.handleTaskEnd(11, 1L) === Seq(1), "job 2 ended, job 1 active")
      // execution end releases the cancelled query's share
      val before = b.outstanding.get()
      b.handleExecutionEnd("B")
      assert(b.outstanding.get() === before - 65L)
      assert(b.outstandingHighWater.get() === before)
    } finally b.detach()
  }

  test("shared-stage spill after the registering job ends still counts (exec-keyed)") {
    val b = SpillBudget.attach(spark, 100L)
    try {
      // stage 10 registered by job 1, shared with job 2 (same execution)
      b.handleJobStart(1, Some("A"), Seq(10))
      b.handleJobStart(2, Some("A"), Seq(10, 11))
      b.handleJobEnd(1)
      // the first registrant is gone; the stage must still charge A —
      // a job-keyed attribution silently dropped this (ADVICE r12)
      assert(b.handleTaskEnd(10, 60L) === Nil)
      assert(b.outstanding.get() === 60L)
      // TaskEnd delivered after JobEnd (cancellation path) counts too,
      // right up to execution end
      b.handleJobEnd(2)
      assert(b.handleTaskEnd(11, 50L) === Nil,
        "no ACTIVE jobs to cancel, but the spill is still accounted")
      assert(b.outstanding.get() === 110L)
      b.handleExecutionEnd("A")
      assert(b.outstanding.get() === 0L)
      // after execution end the temp files are gone: nothing to charge
      assert(b.handleTaskEnd(10, 99L) === Nil)
      assert(b.outstanding.get() === 0L)
    } finally b.detach()
  }

  test("within budget: real spill is accounted, query succeeds") {
    val b = SpillBudget.attach(spark, Long.MaxValue >> 1)
    try {
      withSpillForced {
        assert(spillingCount(4) > 0L)
      }
      awaitListener(b.outstandingHighWater.get() > 0L)
      assert(b.cancelCount.get() === 0L)
    } finally b.detach()
  }

  test("e2e under the audit harness: cancel is recorded resource_exhausted, " +
      "neighbors before/after are untouched (r13 item 5)") {
    // The bench/verify harness shape: QueryAudit + SpillBudget both
    // attached, a sweep of registry queries with ONE deliberately
    // over-cap query in the middle. The cancel must land in the audit
    // log as the resource class, the marker must never misfire on a
    // neighbor, and the session must keep serving queries afterwards.
    val audit = QueryAudit.attach(spark, maxRecords = 64)
    val b = SpillBudget.attach(spark, 1L)
    try {
      def neighbor(name: String): Unit =
        assert(SparkEntry.queries(name)(spark, sfDir).count() > 0L, name)
      neighbor("q1_agg") // before: a healthy control
      val e = intercept[Exception] {
        withSpillForced { spillingCount(16) }
      }
      assert(QueryAudit.classifyCode(e) === "resource_exhausted")
      // same session, immediately after the cancel: unaffected — both
      // a scan-agg and an LSH-family query (shuffles, checkpoints)
      neighbor("q1_agg")
      neighbor("l_dedup_minhash")
      // listener-bus dispatch is async: wait for the failure record
      // and the last neighbor's ok records to land
      awaitListener(audit.recordsRaw().exists(_.error_class == "resource") &&
        audit.recordsRaw().count(_.status == "ok") >= 3)
      val recs = audit.recordsRaw()
      val resource = recs.filter(_.error_class == "resource")
      assert(resource.nonEmpty, "the cancelled query must be audited as resource class")
      assert(resource.forall(_.status == "error"))
      // the namespaced marker appears ONLY on the cancelled execution —
      // neighbors are status ok, no resource/internal class, and their
      // messages never echo the marker (ADVICE r12's misfire guard)
      val ok = recs.filter(_.status == "ok")
      assert(ok.size >= 3, s"neighbors must succeed: ${recs.map(r => (r.status, r.error_class))}")
      assert(ok.forall(r => r.error_class == "" &&
        !r.error_message.contains(SpillBudget.CancelReason)))
      assert(b.cancelCount.get() >= 1L)
    } finally { b.detach(); audit.detach() }
  }

  test("over budget: query fails with the cancel reason, classified resource_exhausted") {
    val b = SpillBudget.attach(spark, 1L)
    try {
      val e = intercept[Exception] {
        withSpillForced {
          spillingCount(16) // 4 task waves on local[4]: the first
          // wave's task-end crosses the 1-byte cap and cancels the
          // job while later waves are still queued
        }
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains(SpillBudget.CancelReason)),
        s"cancel reason must surface in the failure: ${e.getMessage}")
      // the M87 taxonomy lands it in the resource class, exactly like
      // DataFusion's ResourcesExhausted from the reference's cap
      assert(QueryAudit.classifyCode(e) === "resource_exhausted")
      assert(QueryAudit.errorClass(e) === "resource")
      assert(b.cancelCount.get() >= 1L)
    } finally b.detach()
  }
}
