package graft

import org.apache.spark.sql.functions._

/** Audit + error-taxonomy coverage (reference #1406/#1435 analogs:
  * `rust/public/src/servers/query_audit.rs`,
  * `rust/public/src/servers/flight_sql_service_impl.rs:96`).
  */
class QueryAuditSpec extends SparkSpec {

  test("success record carries duration, rows and memory metrics") {
    // register the lakehouse views BEFORE attaching, so the audit sees
    // exactly the one query action (view construction runs its own
    // checkpoint actions, which would land as extra records)
    Graft.query(spark, sfDir, "SELECT 1").collect()
    val audit = QueryAudit.attach(spark)
    try {
      val base = audit.recordCount
      // a sort+agg plan so Tungsten registers peakMemory on at least
      // one operator
      Graft.query(spark, sfDir,
        "SELECT level, count(*) AS n FROM log_entries GROUP BY level ORDER BY n DESC")
        .collect()
      audit.awaitQuiesce(base + 1)
      val recs = audit.records().where(col("status") === "ok").collect()
      assert(recs.nonEmpty)
      val r = recs.last
      assert(r.getAs[Long]("rows_out") >= 3L,
        "three levels in sf0.001 log_entries (cumulative metric may exceed)")
      assert(r.getAs[Double]("duration_ms") > 0.0)
      assert(r.getAs[Long]("peak_memory_bytes") > 0L,
        "sort/agg must register Tungsten peak memory")
      assert(r.getAs[Long]("spilled_bytes") >= 0L)
      assert(r.getAs[String]("plan_text").nonEmpty)
      assert(audit.peakMemoryHighWater.get() >= r.getAs[Long]("peak_memory_bytes"))
    } finally audit.detach()
  }

  test("plan-time user error: classified invalid_argument/user, counted, never internal") {
    val audit = QueryAudit.attach(spark)
    try {
      val e = intercept[QueryAudit.GraftQueryException] {
        audit.query(sfDir, "SELECT no_such_column FROM log_entries")
      }
      assert(e.errorClass === "user")
      assert(e.getMessage.contains(s"query_id=${e.queryId}"))
      // the analysis message (with Spark's column pointer) reaches the
      // client — it's the caller's mistake, i.e. the actionable part
      assert(e.getMessage.toLowerCase.contains("no_such_column"))
      assert(audit.queryFailedUser.get() === 1L)
      assert(audit.queryFailed.get() === 0L, "user errors must not fire query_failed")
      val rec = audit.records().where(col("status") === "error").collect().last
      assert(rec.getAs[String]("error_class") === "user")
      assert(rec.getAs[Long]("query_id") === e.queryId)
    } finally audit.detach()
  }

  test("syntax error carries a position pointer and classifies user") {
    val audit = QueryAudit.attach(spark)
    try {
      val e = intercept[QueryAudit.GraftQueryException] {
        audit.query(sfDir, "SELEC level FROM log_entries")
      }
      assert(e.errorClass === "user")
      // ParseException embeds line/pos — the collect_spans analog
      assert(e.getMessage.contains("line") || e.getMessage.contains("pos"))
    } finally audit.detach()
  }

  test("classification taxonomy: root-cause walk, four classes") {
    import QueryAudit.{classifyCode, errorClass}
    val parse = intercept[Exception](spark.sql("SELEC 1"))
    assert(classifyCode(parse) === "invalid_argument")
    // wrapped: execution-time SparkException around a user cause still
    // classifies by its ROOT (find_root analog)
    val wrapped = new org.apache.spark.SparkException("stage failed",
      new IllegalArgumentException("bad bucket count"))
    assert(classifyCode(wrapped) === "invalid_argument")
    assert(errorClass(wrapped) === "user")
    assert(classifyCode(new UnsupportedOperationException("no such thing")) === "unimplemented")
    assert(errorClass(new UnsupportedOperationException("x")) === "user")
    assert(classifyCode(new OutOfMemoryError("heap")) === "resource_exhausted")
    assert(errorClass(new OutOfMemoryError("heap")) === "resource")
    assert(classifyCode(new RuntimeException("npe deep inside")) === "internal")
    assert(errorClass(new RuntimeException("x")) === "internal")
  }

  test("internal errors leak nothing but the query id to the client") {
    val boom = new RuntimeException("secret internal detail: /etc/shadow")
    val msg = QueryAudit.clientMessage(boom, 42L)
    assert(msg.contains("query_id=42"))
    assert(!msg.contains("secret"), "internal cause text must stay server-side")
  }

  test("ring buffer bounds the audit log") {
    val audit = QueryAudit.attach(spark, maxRecords = 3)
    try {
      val base = audit.recordCount
      (1 to 5).foreach(i => spark.range(i.toLong).count())
      audit.awaitQuiesce(math.min(base + 5, 3))
      // give the bus a moment to drain all five, then check the bound
      Thread.sleep(500)
      assert(audit.recordCount <= 3)
    } finally audit.detach()
  }
}
