package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * Aggregation skew is already absorbed by partial aggregation (every
  * groupBy here combines map-side), and AQE splits skewed *shuffle*
  * join partitions at runtime. Salting covers the remaining case: a
  * shuffled join where one hot key floods a partition and AQE's
  * split granularity isn't enough (or AQE is off).
  */
object Skew {

  /** Salted equi-join: the large side gets a deterministic salt from
    * `saltSource` (any column with per-row entropy, e.g. its row key),
    * the small side is replicated across all `n` salts. The shuffle
    * then spreads each hot key over `n` partitions. Result equals the
    * plain inner join.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltSource: Column, n: Int): DataFrame = {
    val l = large.withColumn("__salt", pmod(hash(saltSource), lit(n)))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    // Salting only helps a SHUFFLED join (a broadcast join has no
    // partition skew to spread) — but Catalyst's post-explode size
    // estimate ignores the n-fold replication, so it happily planned
    // the salted side as a static BroadcastHashJoin (1.45 GB built at
    // sf1, n× the un-salted broadcast, measured by BroadcastBudgetSpec).
    // Pin the shuffled-hash path: the (key, salt) exchange is the whole
    // point of the operator.
    l.join(s.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }
}
