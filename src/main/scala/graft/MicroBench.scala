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
      .config("spark.sql.adaptive.enabled", "true")
      // Post-shuffle partitioning that survives scale: the pinned
      // shuffle.partitions = cores floor spilled 219 GB at the third
      // decade (25M pair-agg rows per partition, PLANS.md r10) — the
      // idiomatic fix is a LARGE initial partition count that AQE
      // coalesces back to ~64 MB targets at small SFs, so one config
      // serves every decade. On a real cluster this is the same knob
      // ops sets cluster-wide.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
