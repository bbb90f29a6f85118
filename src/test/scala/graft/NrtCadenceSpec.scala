package graft

import graft.operators.{NrtCadence, SqlBatchView}

/** The NRT materialization cadence, replayed with an injected clock:
  * fine ticks materialize each just-closed slice, coarse ticks compact
  * the fine fragments — and at every stage the lake answers exactly
  * like the direct (unmaterialized) view. Mirrors the reference
  * maintenance daemon's EverySecond/EveryMinute task semantics with
  * hour/day tiers standing in for second/minute (the testdata spans
  * days; the slice arithmetic is tier-agnostic).
  */
class NrtCadenceSpec extends SparkSpec with TmpDirSupport {

  private val v = SqlBatchView.logStats
  private val fine = 6L * 3600000L   // 6h tier
  private val coarse = 24L * 3600000L // 1d tier

  private def bounds: (Long, Long) = {
    val r = Graft.query(spark, sfDir,
      "SELECT min(time_ms), max(time_ms) FROM log_entries").head()
    (r.getLong(0), r.getLong(1) + 1)
  }

  private def direct: Seq[String] =
    canon(new Lakehouse(spark, sfDir).logStats)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("time_bin_ms", "process_id", "level", "target")
      .collect().map(_.toString).toSeq

  private def sliceDirs(dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("slice_ms="))
      .map(_.stripPrefix("slice_ms=").toLong).sorted
  }

  test("tick slices are the closed [trunc-2d, trunc-d) window on the cadence grid") {
    assert(NrtCadence.tickSlice(10500, 1000) === ((8000L, 9000L)))
    assert(NrtCadence.tickSlice(10000, 1000) === ((8000L, 9000L)))
    assert(NrtCadence.tickTimes(999, 4001, 1000) === Seq(1000L, 2000L, 3000L, 4000L))
    // consecutive firings materialize CONTIGUOUS slices — no gap, no overlap
    val ends = NrtCadence.tickTimes(0, 10000, 1000).map(NrtCadence.tickSlice(_, 1000))
    ends.sliding(2).foreach { case Seq((_, e1), (b2, _)) => assert(e1 === b2) }
  }

  test("cadence replay == direct view; compaction shrinks the lake and changes nothing") {
    Graft.registerViews(spark, sfDir)
    val (lo, hi) = bounds
    val dir = tmpDir("nrt") + "/v"

    // fine tier only: every 6h tick the daemon would have fired across
    // the data's span (+2 tiers so the last slice closes)
    var written = 0L
    NrtCadence.tickTimes(lo, hi + 2 * fine + 1, fine).foreach { t =>
      val w = NrtCadence.tick(spark, v, dir, t, fine)
      if (w > 0) written += w
    }
    assert(written > 0)
    val fineSlices = sliceDirs(dir)
    assert(fineSlices.size > 2, s"expected several fine slices, got $fineSlices")
    assert(canon(SqlBatchView.query(spark, v, dir)) === direct)

    // re-fired ticks are freshness no-ops (the daemon double-firing a
    // slice must not rewrite closed partitions)
    NrtCadence.tickTimes(lo, hi + 2 * fine + 1, fine).foreach { t =>
      assert(NrtCadence.tick(spark, v, dir, t, fine) === -1L)
    }

    // coarse tier: compact each closed day; fewer partitions, same rows
    NrtCadence.tickTimes(lo, hi + 2 * coarse + 1, coarse).foreach { t =>
      NrtCadence.compact(spark, v, dir, t, coarse)
    }
    val coarseSlices = sliceDirs(dir)
    assert(coarseSlices.size < fineSlices.size,
      s"compaction did not shrink: ${fineSlices.size} -> ${coarseSlices.size}")
    assert(canon(SqlBatchView.query(spark, v, dir)) === direct)
  }

  test("catchUp replays a downtime window deterministically and idempotently") {
    Graft.registerViews(spark, sfDir)
    val (lo, hi) = bounds
    val dir = tmpDir("nrt-catchup") + "/v"
    val to = hi + 2 * coarse + 1

    val first = NrtCadence.catchUp(spark, v, dir, lo, to, fine, coarse)
    assert(first.ticksRun > 0)
    assert(first.compactions > 0)
    assert(canon(SqlBatchView.query(spark, v, dir)) === direct)
    val slices = sliceDirs(dir)

    // full-range replay (daemon restarted with a stale cursor):
    // outcome-idempotent — same partitions, same answer
    val again = NrtCadence.catchUp(spark, v, dir, lo, to, fine, coarse)
    assert(again.ticksSkipped > 0)
    assert(sliceDirs(dir) === slices)
    assert(canon(SqlBatchView.query(spark, v, dir)) === direct)
  }
}
