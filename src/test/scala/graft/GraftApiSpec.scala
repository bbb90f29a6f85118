package graft

class GraftApiSpec extends SparkSpec {

  private def micros(iso: String): Long =
    java.time.Instant.parse(iso).toEpochMilli * 1000L

  test("query(sql) over lakehouse views") {
    val df = Graft.query(spark, sfDir,
      "SELECT level, count(*) AS n FROM log_entries GROUP BY level ORDER BY level")
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(2, 4, 5))
    assert(rows.map(_.getLong(1)).sum === 1000L)
  }

  test("query(sql, begin, end) scopes every scan to the range") {
    val all = Graft.query(spark, sfDir, "SELECT count(*) FROM events").head().getLong(0)
    val scoped = Graft.query(spark, sfDir, "SELECT count(*) FROM events",
      Some(micros("2024-01-01T00:00:00Z")), Some(micros("2024-01-15T00:00:00Z")))
      .head().getLong(0)
    assert(scoped > 0 && scoped < all)
  }

  test("thread_spans view is queryable and concurrent query() calls don't cross-leak ranges") {
    val spans = Graft.query(spark, sfDir,
      "SELECT process_id, count(*) AS n, max(duration_ms) AS mx FROM thread_spans GROUP BY process_id")
    assert(spans.count() > 0)
    // concurrent ranged + unranged queries on the same session: the
    // unranged one must see ALL rows every time (no range leak in) and
    // the ranged one must see exactly its scoped count every time (no
    // sibling unset/overwrite stripping or changing the range)
    val b = Some(micros("2024-01-01T00:00:00Z"))
    val e = Some(micros("2024-01-15T00:00:00Z"))
    val all = Graft.query(spark, sfDir, "SELECT count(*) FROM events").head().getLong(0)
    val scoped = Graft.query(spark, sfDir, "SELECT count(*) FROM events", b, e).head().getLong(0)
    assert(scoped > 0 && scoped < all)
    val threads = (1 to 4).map { i =>
      new Thread {
        var ok = true
        override def run(): Unit =
          // an exception is as much a race symptom as a wrong count —
          // it must fail the test, not die silently with ok still true
          try (1 to 5).foreach { _ =>
            val (n, want) =
              if (i % 2 == 0)
                (Graft.query(spark, sfDir, "SELECT count(*) FROM events").head().getLong(0), all)
              else
                (Graft.query(spark, sfDir, "SELECT count(*) FROM events", b, e).head().getLong(0), scoped)
            if (n != want) ok = false
          } catch { case _: Throwable => ok = false }
      }
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(threads.forall(_.ok), "a query() observed a sibling's range state")
  }

  test("per-query range is authoritative over a static conf range, and doesn't stack on re-analysis") {
    val all = Graft.query(spark, sfDir, "SELECT count(*) FROM events").head().getLong(0)
    val b = Some(micros("2024-01-01T00:00:00Z"))
    val e = Some(micros("2024-01-15T00:00:00Z"))
    val scoped = Graft.query(spark, sfDir, "SELECT count(*) FROM events", b, e).head().getLong(0)
    // static conf range = a DIFFERENT, non-overlapping window
    spark.conf.set("spark.graft.queryRange.beginMicros", micros("2024-03-01T00:00:00Z").toString)
    spark.conf.set("spark.graft.queryRange.endMicros", micros("2024-03-15T00:00:00Z").toString)
    try {
      // head() triggers re-analysis AFTER the thread-local cleared, with
      // the conf range live — the injected filter must stay authoritative
      // (stacking would intersect disjoint windows → 0 rows)
      val n = Graft.query(spark, sfDir, "SELECT count(*) FROM events", b, e).head().getLong(0)
      assert(n === scoped, s"per-query range result changed under a static conf range: $n vs $scoped")
      // an explicitly unranged query() must NOT inherit the conf range
      val n2 = Graft.query(spark, sfDir, "SELECT count(*) FROM events").head().getLong(0)
      assert(n2 === all, s"unranged query() inherited the static conf range: $n2 vs $all")
    } finally {
      spark.conf.unset("spark.graft.queryRange.beginMicros")
      spark.conf.unset("spark.graft.queryRange.endMicros")
    }
  }

  test("observability SQL: histogram over measures via registered functions") {
    val df = Graft.query(spark, sfDir,
      """SELECT name, graft_make_histogram(0.0, 500.0, 10, value) AS h
         FROM measures GROUP BY name""")
    val row = df.where("name = 'error'").select("h.count").head()
    assert(row.getLong(0) > 0)
  }
}
