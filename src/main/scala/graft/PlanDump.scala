package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dump .explain("formatted") for registered queries to files — the
  * committed plan evidence for optimization rounds (the judge reads
  * plans/<round>/<query>_{before,after}.txt; MicroBench times, this
  * records).
  *
  * r16 rebuild (VERDICT r15 item 3 + ADVICE r15):
  *  - a query fn may run SEVERAL QueryExecutions (localCheckpoint
  *    materializations, internal collects, training rounds). The r15
  *    version explained only the final DataFrame, so every
  *    localCheckpoint truncated the committed evidence to the
  *    post-checkpoint segment — blind exactly where changes lived. A
  *    QueryExecutionListener now captures EVERY execution; earlier
  *    segments land as `<query>_<suffix>_seg<k>.txt`, the final plan
  *    stays `<query>_<suffix>.txt`.
  *  - the r15 version ran df.count() and then explained df — but
  *    count() builds its OWN QueryExecution, so the dumped plan was
  *    the pre-execution adaptive plan (isFinalPlan=false). Each
  *    segment is now explained from the listener's OWN executed
  *    QueryExecution after the query runs through the noop sink
  *    (guide §1.4), so AQE-final effects (partition coalescing,
  *    adaptive join conversion) are in the committed evidence.
  *
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
    // Shared session config: GraftSession.base — the dumped plan is
    // the plan the bench actually runs, enforced by construction.
    val spark = GraftSession.base(sfDir, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    val qs = SparkEntry.headlineQueries.filter(q => names.isEmpty || names(q.name))
    qs.foreach { q =>
      val segs = new ConcurrentLinkedQueue[(Int, String, String)]()
      val n = new AtomicInteger(0)
      val listener = new QueryExecutionListener {
        override def onSuccess(fn: String, qe: QueryExecution, d: Long): Unit = {
          // explained HERE, post-execution, so the adaptive plan is
          // final for this segment (isFinalPlan=true)
          val plan = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
          segs.add((n.incrementAndGet(), fn, plan))
        }
        override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        val df = q.fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        // the listener bus is async: wait until the segment stream
        // quiesces (no new segment for 500 ms, 15 s cap)
        var last = -1
        var stable = 0
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while (stable < 5 && System.nanoTime() < deadline) {
          Thread.sleep(100)
          val now = n.get()
          if (now == last && now > 0) stable += 1 else { stable = 0; last = now }
        }
      } finally spark.listenerManager.unregister(listener)
      val all = segs.toArray(Array.empty[(Int, String, String)]).sortBy(_._1)
      if (all.isEmpty) System.err.println(s"[plandump] ${q.name}: no executions captured")
      else {
        // the final segment is the query's own plan; earlier ones are
        // its checkpoint/collect segments, numbered in execution order
        val main = all.last
        Files.write(outDir.resolve(s"${q.name}_$suffix.txt"), main._3.getBytes("UTF-8"))
        println(s"[plandump] wrote ${q.name}_$suffix.txt (${main._3.length} chars, " +
          s"fn=${main._2}, ${all.length - 1} earlier segments)")
        all.init.foreach { case (i, fn, plan) =>
          val f = s"${q.name}_${suffix}_seg$i.txt"
          Files.write(outDir.resolve(f), s"-- segment $i: $fn\n$plan".getBytes("UTF-8"))
          println(s"[plandump] wrote $f (${plan.length} chars, fn=$fn)")
        }
      }
    }
    spark.stop()
  }
}
