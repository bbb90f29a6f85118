package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a reusable
  * operator: d md5-derived hash rows × w counters, cross-engine exact
  * (the hash is standardized md5, the bucket a 32-bit prefix mod w).
  * `l_heavy_hitters` builds and probes it in batch;
  * [[graft.streaming.SketchStream.cmsCells]] maintains it as windowed
  * streaming state. Cells merge by SUM — the defining sketch property:
  * per-partition partials, micro-batch increments, and cross-lake
  * merges all compose without approximation drift.
  */
object Cms {

  val Depth = 4
  val Width = 256L

  /** (j, bucket) array for one token under the d hash rows. */
  def hashes(tok: Column): Column = array(
    (0 until Depth).map { j =>
      struct(lit(j.toLong).as("j"),
        pmod(conv(substring(md5(concat(lit(s"$j|"), tok)), 1, 8), 16, 10).cast("long"),
          lit(Width)).as("bucket"))
    }: _*)

  /** Sketch cells (j, bucket, cell) for a token column — the batch
    * build: one partial-agg HashAggregate over ≤ d·w groups.
    */
  def cells(toks: DataFrame, tokCol: String): DataFrame =
    toks.select(explode(hashes(col(tokCol))).as("hb"))
      .groupBy(col("hb.j").as("j"), col("hb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cell"))

  /** Point estimate for probe tokens: min over the d row cells.
    * `probes` must carry `tokCol`; the sketch is broadcast. Left join:
    * a probe token absent from the build corpus may have EMPTY cells
    * (no collisions landed in its buckets) — those must read 0, and a
    * partial miss must not take the min over fewer than d rows.
    */
  def estimate(probes: DataFrame, tokCol: String, sketch: DataFrame): DataFrame = {
    val keep = probes.columns.map(col)
    probes.select(keep :+ explode(hashes(col(tokCol))).as("hb"): _*)
      .select(keep :+ col("hb.j").as("j") :+ col("hb.bucket").as("bucket"): _*)
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(probes.columns.head, probes.columns.tail: _*)
      .agg(min(coalesce(col("cell"), lit(0L))).as("cms_est"))
  }
}
