package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front door mirroring the reference client API
  * (python/micromegas: client.query(sql, begin, end)): registers the
  * lakehouse views + raw tables for the session, applies the optional
  * query time range through [[graft.plans.TimeRangeRewrite]], and runs
  * the SQL. Range scoping is an analyzer rewrite, so it reaches every
  * scan in the query — including subqueries — and pushes into parquet.
  */
object Graft {

  /** Register raw tables and lakehouse views as temp views. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    functions.GraftFunctions.register(spark)
    Tables.all.foreach(n => Tables.df(spark, dir, n).createOrReplaceTempView(n))
    val lk = new Lakehouse(spark, dir)
    lk.logEntries.createOrReplaceTempView("log_entries")
    lk.measures.createOrReplaceTempView("measures")
    lk.logStats.createOrReplaceTempView("log_stats")
    lk.threadSpans.createOrReplaceTempView("thread_spans")
  }

  /** client.query(sql, begin, end) analog. Timestamps are epoch
    * microseconds UTC; either bound may be omitted.
    */
  def query(spark: SparkSession, dir: String, sql: String,
      beginMicros: Option[Long] = None, endMicros: Option[Long] = None): DataFrame = {
    if (beginMicros.nonEmpty || endMicros.nonEmpty) {
      // range scoping is an analyzer rule; fail loudly rather than
      // silently returning unscoped data on a session built without it
      val hasRule = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.analyzer.extendedResolutionRules
        .exists(_.isInstanceOf[graft.plans.TimeRangeRewrite])
      require(hasRule,
        "time-range scoping requires a session built with " +
          ".withExtensions(new graft.functions.GraftExtensions)")
    }
    // The range travels through session conf to the analyzer rule, so
    // concurrent query() calls on one session could leak a range into
    // (or unset it under) a sibling's analysis. Serialize the
    // register → conf-set → analyze → conf-unset window per session;
    // execution of the returned DataFrame happens outside the lock and
    // no longer reads the conf. Two details are load-bearing:
    // registerViews must be INSIDE the lock (createOrReplaceTempView
    // analyzes the view plan — under a sibling's live range it would
    // bake that range into the stored view, poisoning later queries),
    // and unranged queries take the lock too.
    spark.synchronized {
      registerViews(spark, dir)
      beginMicros.foreach(b => spark.conf.set("spark.graft.queryRange.beginMicros", b.toString))
      endMicros.foreach(e => spark.conf.set("spark.graft.queryRange.endMicros", e.toString))
      try {
        val df = spark.sql(sql)
        // Spark 4 analyzes lazily (QueryExecution.lazyAnalyzed): without
        // forcing it HERE, the range rewrite would read the conf at the
        // first action — outside this lock, racing sibling queries.
        df.queryExecution.analyzed
        df
      } finally {
        spark.conf.unset("spark.graft.queryRange.beginMicros")
        spark.conf.unset("spark.graft.queryRange.endMicros")
      }
    }
  }
}
