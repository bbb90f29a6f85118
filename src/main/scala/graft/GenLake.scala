package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up lake generator: synthesizes an sfN lake from the driver's
  * sf0.1 tables by replicating each table R times into DISJOINT
  * sub-universes (every id column offset by replica × 10⁷, referential
  * integrity preserved within a replica), so correctness can be
  * re-checked against DuckDB one decade up and 10× growth ratios can be
  * MEASURED instead of argued (round-8 verdict item 2: every 100 TB
  * claim was design-level because /root/testdata tops out at 17 MB).
  *
  * Replication is NOT naive copying where it would distort the
  * workload's asymptotics:
  *   - `documents.text` is perturbed per replica (every third word gets
  *     a replica tag) so no word-3-gram shingle survives across
  *     replicas: near-dup candidate generation (MinHash bands, posting
  *     lists, containment) grows LINEARLY in replicas, as a real
  *     corpus would, instead of quadratically as verbatim copies would
  *     (every doc would gain 9 exact twins). Within-replica duplicate
  *     structure is preserved exactly. `n_chars` is recomputed.
  *   - `embeddings.embedding` is cyclically rotated by the replica
  *     index (norm-preserving, decorrelating) so cross-replica vectors
  *     are not cosine near-dups and ANN candidate lists stay bounded.
  *   - `region`/`nation` stay fixed (dimension tables don't grow with
  *     scale factor, same as TPC-H).
  *   - timestamps are untouched: per-hour event density and fleet size
  *     grow 10×, the 30-day span stays — which is what data growth
  *     looks like to the day-partitioned lakehouse layout.
  *
  * Each table lands as a SINGLE parquet file named `<table>.parquet`
  * (driver layout; DuckDB's parquet_scan takes the same path), written
  * with Spark parallelism then concatenated by a final single-task
  * write of the already-shuffled rows.
  *
  * Usage: runMain graft.GenLake [baseDir] [outDir] [replicas]
  */
object GenLake {

  /** Per-replica id offset: far above every base key space (max base
    * key is o_orderkey = 149,999 at sf0.1) and small enough that
    * replica 9999 still fits a Long with room for arithmetic.
    */
  val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    // optional 4th arg: comma-separated subset of tables to generate
    // (third-decade probes need only documents+embeddings — generating
    // 600M lineitem rows to time five corpus queries would be waste)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    require(reps >= 1 && reps <= 1000, s"replicas out of range: $reps")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(out))

    def src(t: String): DataFrame = spark.read.parquet(s"$base/$t.parquet")

    /** Offset the named int64 id columns by r·Off; leave the rest. */
    def shift(df: DataFrame, r: Int, ids: String*): DataFrame =
      ids.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(r * Off)))

    /** Replicate one table. `ids` are the columns `f` offsets by r·Off;
      * the base values of each MUST sit below Off, or replica id
      * universes collide — which is exactly what happens when an
      * already-generated lake (target/sf1) is mistakenly fed back in as
      * the base. Assert it up front with a clear message instead of
      * silently breaking the documented disjointness.
      */
    def replicate(t: String, ids: Seq[String])(f: (DataFrame, Int) => DataFrame): Unit = {
      if (only.exists(!_.contains(t))) return
      require(reps <= 200,
        s"replicate($t): the union formulation builds a $reps-branch plan " +
          "tree — use the join-based path (replicateJoin) beyond 200 replicas")
      val b = src(t)
      if (ids.nonEmpty) {
        val maxes = b.agg(max(col(ids.head)), ids.tail.map(c => max(col(c))): _*).head()
        ids.zipWithIndex.foreach { case (c, i) =>
          val m = if (maxes.isNullAt(i)) 0L else maxes.getLong(i)
          require(m < Off,
            s"GenLake: $t.$c max id $m >= replica offset $Off — the base dir " +
              s"'$base' looks like an already-replicated lake; replicating it " +
              "again would collide replica id universes. Point GenLake at the " +
              "original driver testdata instead.")
        }
      }
      val u = (0 until reps).map(r => f(b, r)).reduce(_ unionAll _)
      writeOne(u, Paths.get(out, s"$t.parquet"))
      println(s"[genlake] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    /** Join-based replication: base × range(reps) with the per-replica
      * transform expressed over the replica-index COLUMN `r`. A
      * reduce(unionAll) of 1000 branches is itself a scale defect (a
      * depth-1000 plan tree: quadratic analysis, stack-overflow risk) —
      * the third decade must not be generated by a generator that
      * wouldn't survive a fourth. Same rows as the union formulation,
      * different physical order (irrelevant to every consumer).
      */
    def replicateJoin(t: String, ids: Seq[String])(f: DataFrame => DataFrame): Unit = {
      if (only.exists(!_.contains(t))) return
      val b = src(t)
      if (ids.nonEmpty) {
        val maxes = b.agg(max(col(ids.head)), ids.tail.map(c => max(col(c))): _*).head()
        ids.zipWithIndex.foreach { case (c, i) =>
          val m = if (maxes.isNullAt(i)) 0L else maxes.getLong(i)
          require(m < Off,
            s"GenLake: $t.$c max id $m >= replica offset $Off — the base dir " +
              s"'$base' looks like an already-replicated lake; replicating it " +
              "again would collide replica id universes. Point GenLake at the " +
              "original driver testdata instead.")
        }
      }
      val joined = b.crossJoin(spark.range(reps).toDF("r"))
      val shifted = ids.foldLeft(joined)((d, c) => d.withColumn(c, col(c) + col("r") * lit(Off)))
      writeOne(f(shifted).drop("r"), Paths.get(out, s"$t.parquet"))
      println(s"[genlake] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    // dimensions: fixed regardless of scale factor
    replicate("region", Nil)((b, r) => if (r == 0) b else b.limit(0))
    replicate("nation", Nil)((b, r) => if (r == 0) b else b.limit(0))

    replicate("customer", Seq("c_custkey"))((b, r) => shift(b, r, "c_custkey"))
    replicate("supplier", Seq("s_suppkey"))((b, r) => shift(b, r, "s_suppkey"))
    replicate("part", Seq("p_partkey"))((b, r) => shift(b, r, "p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))((b, r) => shift(b, r, "o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))((b, r) => shift(b, r, "l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))((b, r) => shift(b, r, "event_id", "user_id"))

    replicateJoin("documents", Seq("doc_id")) { d =>
      d
        // tag every third word of replicas r>0: each 3-word window holds
        // ≥1 tagged position, so no word-3-gram shingle matches across
        // replicas
        .withColumn("text", when(col("r") === 0L, col("text")).otherwise(expr(
          "array_join(transform(split(text, ' '), (w, i) -> IF(i % 3 = 2, concat(w, 'x', CAST(r AS STRING)), w)), ' ')")))
        .withColumn("n_chars",
          when(col("r") === 0L, col("n_chars"))
            .otherwise(length(col("text")).cast("long")))
    }

    replicateJoin("embeddings", Seq("vec_id")) { d =>
      // rotation wraps at dim 64, so replicas 64.. would copy replica
      // (r-64) verbatim — negate on each wrap instead: negation is
      // norm-preserving, int8-quantization-exact, and cos(v, -rot(v))
      // is strongly negative, never a near-dup
      d.withColumn("rot", expr("CAST(r % 64 AS INT)"))
        .withColumn("embedding", when(col("rot") === 0, col("embedding")).otherwise(expr(
          "concat(slice(embedding, rot + 1, size(embedding) - rot), slice(embedding, 1, rot))")))
        .withColumn("embedding",
          when(expr("(r div 64) % 2 = 1"),
            expr("transform(embedding, x -> cast(-x as float))"))
            .otherwise(col("embedding")))
        .drop("rot")
    }

    spark.stop()
    println(s"[genlake] done: $out (${reps}x $base)")
  }

  /** Write `df` as a single parquet FILE at `dest` (driver layout).
    * The compute runs at full parallelism; only the final file concat
    * is single-task (repartition(1) after the transforms are done).
    */
  private def writeOne(df: DataFrame, dest: Path): Unit = {
    val tmp = dest.resolveSibling(dest.getFileName.toString + "_tmp")
    // Small row groups (4 MB vs the 128 MB default): Spark's split
    // parallelism on a SINGLE parquet file is bounded by row-group
    // count — the default wrote documents.parquet as ONE 68 MB row
    // group at sf10, so every scan of it ran one task (the r10 stage
    // profile measured a 300 s single-core stage behind that). A real
    // 100 TB lake gets its parallelism from file count; this single-file
    // driver layout must get it from row groups instead.
    df.repartition(1).write.mode("overwrite")
      .option("parquet.block.size", 4L * 1024 * 1024)
      .parquet(tmp.toString)
    val part = scala.util.Using.resource(Files.list(tmp)) { ls =>
      ls.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
    }
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    // clean the tmp dir (SUCCESS markers, crc files)
    scala.util.Using.resource(Files.walk(tmp)) { walk =>
      walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
