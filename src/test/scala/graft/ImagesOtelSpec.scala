package graft

import org.apache.spark.sql.functions._

/** Specs for the round-4 view sets: images (instance-only screenshot
  * blocks) and otel_spans (OTLP-shaped spans).
  */
class ImagesOtelSpec extends SparkSpec {

  private def lk = new Lakehouse(spark, sfDir)

  test("images instance returns screenshot rows with consistent payload accounting") {
    val img = lk.viewInstance("images", "7").cache()
    try {
      val n = img.count()
      assert(n > 0, "process 7 should have view events at sf0.001")
      // payload_size must equal the actual byte length of data
      assert(img.where(octet_length(col("data")) =!= col("payload_size")).count() === 0)
      // format vocabulary is closed
      assert(img.where(!col("format").isin("png", "jpeg", "webp")).count() === 0)
      // one row per source view event, scoped to the instance
      val views = Tables.df(spark, sfDir, "events")
        .where(col("event_type") === "view" && col("user_id") === 7).count()
      assert(n === views)
      assert(img.select("process_id").distinct().collect().map(_.getString(0)).toSeq === Seq("7"))
    } finally img.unpersist()
  }

  test("images is instance-only in spirit: non-canonical ids match nothing") {
    assert(lk.viewInstance("images", "07").count() === 0)
    assert(lk.viewInstance("images", " 7").count() === 0)
  }

  test("otel_spans ids are W3C-shaped and parents resolve within the trace") {
    val sp = lk.otelSpans.cache()
    try {
      assert(sp.count() > 0)
      assert(sp.where(length(col("trace_id")) =!= 32).count() === 0)
      assert(sp.where(length(col("span_id")) =!= 16).count() === 0)
      assert(sp.where(col("parent_span_id").isNotNull &&
        length(col("parent_span_id")) =!= 16).count() === 0)
      // every non-null parent id exists as a span id in the SAME trace
      val kids = sp.where(col("parent_span_id").isNotNull)
        .select(col("trace_id"), col("parent_span_id").as("pid"))
      val orphans = kids.join(sp.select(col("trace_id"), col("span_id").as("pid")),
        Seq("trace_id", "pid"), "left_anti").count()
      assert(orphans === 0)
      // status vocabulary + message contract
      assert(sp.where(!col("status").isin("OK", "ERROR")).count() === 0)
      assert(sp.where(col("status") === "OK" && col("status_message").isNotNull).count() === 0)
      assert(sp.where(col("status") === "ERROR" && col("status_message").isNull).count() === 0)
      // duration is non-negative and consistent with the ns bounds
      assert(sp.where(col("end_time_ns") - col("start_time_ns") =!= col("duration_ns")).count() === 0)
    } finally sp.unpersist()
  }

  test("otel_spans instance equals the global view filtered to the process") {
    val inst = lk.viewInstance("otel_spans", "7")
    val global = lk.otelSpans.where(col("process_id") === "7")
    assert(inst.exceptAll(global).count() === 0)
    assert(global.exceptAll(inst).count() === 0)
  }
}
