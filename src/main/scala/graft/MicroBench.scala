package graft

import org.apache.spark.sql.SparkSession

/** Isolated per-query timing — the adjudication tool for bench
  * regressions (the full Bench interleaves 30 queries, so one noisy
  * neighbor muddies the read). Usage:
  *   sbt "runMain graft.MicroBench <sfDir> <reps> <query> [query ...]"
  * Prints one JSON line per query with every rep, best and median.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Scan size estimates are FILE bytes x column fraction, but
      // snappy parquet expands 24-31x in memory (sf10 audit: the
      // customer/part dims hid a decade of growth under the broadcast
      // threshold and statically built 192 MB hash relations). 16x
      // keeps the estimate within ~2x of built size, so scan-backed
      // broadcast picks demote on schedule while AQE still re-converts
      // genuinely small sides from ACTUAL compressed bytes.
      .config("spark.sql.sources.fileCompressionFactor", "16")
      .config("spark.sql.adaptive.enabled", "true")
      // Post-shuffle partitioning that survives scale: the pinned
      // shuffle.partitions = cores floor spilled 219 GB at the third
      // decade (25M pair-agg rows per partition, PLANS.md r10). AQE's
      // initialPartitionNum is sized from the LAKE (1 per 2 MB of
      // input, clamped to [cores, 1024]) so exchanges start wide
      // enough at decade scales while the driver SFs keep the exact
      // cores count — zero constant overhead where queries are
      // sub-second. Ops sets the same knob per deployment size on a
      // real cluster; deriving it from the data is the local analog.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Tables.initialShufflePartitions(sfDir, cpus.toInt).toString)
      // AQE's coalesce floor (minPartitionSize, default 1 MB) is sized
      // for IO-bound reducers; behind a SMALL exchange feeding a
      // CPU-DENSE stage (per-process protobuf encode, window pairing)
      // it collapses parallelism to bytes/1MB tasks — the r15
      // m_perfetto_chunks profile ran its two heavy stages on 2-3 of
      // 32 cores. 64 KB keeps parallelismFirst able to reach the
      // default parallelism; a no-op wherever partitions already
      // exceed 1 MB (every large-scale exchange), so it is
      // scale-independent, not a local[32] tune.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // conf-driven spill budget (spark.graft.query.maxSpillMb) live in every
    // session-building driver, not just the gate (ADVICE r12)
    SpillBudget.fromConf(spark): Unit
    val qs = SparkEntry.allQueries.filter(q => names(q.name))
    require(qs.map(_.name).toSet == names,
      s"unknown queries: ${(names -- qs.map(_.name)).mkString(",")}")
    val warmDir = "/root/testdata/sf0.001"
    val warm = if (new java.io.File(warmDir).exists()) warmDir else sfDir
    qs.foreach(q => try q.fn(spark, warm).count() catch { case _: Throwable => () })
    qs.foreach { q =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      println(s"""{"query":"${q.name}","best":${sorted.head},"median":${sorted(reps / 2)},"reps":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
