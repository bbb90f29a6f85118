package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-operator metric dump for ONE query — the constant-factor
  * profiler the round-9 verdict asked for (item 2: l_containment is
  * 47% of the sf10 bench and its time split across shingle build / df
  * agg / pair join / verify has never been measured). Runs the named
  * query once (after a small-SF warm-up), captures the action's
  * QueryExecution via listener, and prints every physical node with
  * its SQLMetrics — timing metrics normalized to milliseconds — in
  * execution (pre-order) position, so wall time can be attributed to
  * plan stages instead of guessed.
  *
  * Usage: runMain graft.StageProfile <sfDir> <query> [reps]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
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
    val q = SparkEntry.allQueries.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).exists())
      try q.fn(spark, warmDir).count() catch { case _: Throwable => () }

    @volatile var captured: QueryExecution = null
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        captured = qe
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    // SQL node metrics measure pipeline CPU, not wall — stage rows
    // (submission→completion wall vs Σtask run/cpu/gc) expose what the
    // node view can't: stragglers, GC stalls, scheduling gaps.
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s)
          .getOrElse(-1L)
        val m = si.taskMetrics
        stages.add(
          f"stage=${si.stageId}%4d tasks=${si.numTasks}%4d wall=${wall}ms " +
          f"run=${m.executorRunTime}ms cpu=${m.executorCpuTime / 1000000}ms " +
          f"gc=${m.jvmGCTime}ms deser=${m.executorDeserializeTime}ms " +
          f"shRead=${m.shuffleReadMetrics.totalBytesRead >> 20}MB " +
          f"shWrite=${m.shuffleWriteMetrics.bytesWritten >> 20}MB " +
          f"spill=${m.memoryBytesSpilled >> 20}MB  ${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    for (rep <- 1 to reps) {
      captured = null
      stages.clear()
      val t0 = System.nanoTime()
      val n = q.fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      var waited = 0
      while (captured == null && waited < 200) { Thread.sleep(50); waited += 1 }
      println(f"== $name rep $rep: wall=$wall%.2fs rows=$n ==")
      Thread.sleep(500) // let late stage-completed events drain
      stages.toArray(Array.empty[String]).sorted.foreach(s => println("  " + s))
      if (captured == null) { println("  (no QueryExecution captured)"); sys.exit(2) }
      var idx = 0
      QueryAudit.walk(captured.executedPlan) { node =>
        val ms = node.metrics.toSeq.sortBy(_._1).map { case (k, m) =>
          val shown = m.metricType match {
            case "nsTiming" => f"${m.value / 1e6}%.0fms"
            case "timing" => s"${m.value}ms"
            case _ => m.value.toString
          }
          s"$k=$shown"
        }.mkString(" ")
        println(f"[$idx%3d] ${node.nodeName}%-45s $ms")
        idx += 1
      }
    }
    spark.stop()
  }
}
