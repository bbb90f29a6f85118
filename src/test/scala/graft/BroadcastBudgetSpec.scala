package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._

/** Mechanized static-broadcast tripwire (VERDICT r10 item 5): round 10
  * found — by hand, via StageProfile — a 3.4 GB posting table planned
  * as a static BroadcastHashJoin at sf10, because Catalyst's
  * post-explode size ESTIMATE sat under the autoBroadcast threshold
  * and AQE never demotes a statically-planned BHJ. The estimate can
  * lie; the executed exchange's `dataSize` metric cannot. So: run
  * every registered query, walk the FINAL (AQE-resolved) plan, and
  * assert every BroadcastExchange's actual built size sits under a
  * budget.
  *
  * Budget: 8 MB at the default sf0.1 audit scale. Legitimate broadcast
  * sides here are dimensions, wall-clock/parameter grids, codebooks,
  * vocabularies, and fixed calibration slices — all ≤ ~2 MB at sf0.1
  * (measured; the budget is 4× the legit high-water mark). A
  * corpus-proportional side (the r10 defect class) is ≥ ~30 MB at
  * sf0.1 and trips immediately. Both the lake dir and the budget are
  * env-overridable so the same spec audits generated decade lakes
  * (GRAFT_BCAST_SF=target/sf1 GRAFT_BCAST_BUDGET_MB=…).
  */
class BroadcastBudgetSpec extends SparkSpec {

  private val auditDir = sys.env.getOrElse("GRAFT_BCAST_SF", "/root/testdata/sf0.1")
  // 12 MB default: the dataSize metric never reads below ~8 MB for a
  // long-keyed relation (LongToUnsafeRowMap's initial page), so the
  // budget sits above that floor while a corpus-proportional side at
  // this SF (~30+ MB, the r10 defect class) still trips it.
  private val budgetBytes =
    sys.env.getOrElse("GRAFT_BCAST_BUDGET_MB", "12").toLong * 1024 * 1024

  /** Adjudicated per-query budgets (max'd with the default):
    *  - The TPC-H entries auto-broadcast a FILTERED FACT side under the
    *    local threshold; their estimates are scan-proportional, so the
    *    same plans demote to shuffle joins at scale — verified by the
    *    sf1 audit (none of them broadcast anything there; PLANS.md r11).
    *  - The ANN entries broadcast the fixed 20k-id calibration slice
    *    and codebooks; the decontamination entries broadcast the
    *    held-out benchmark shingle set. Both are bounded by
    *    construction, not corpus-proportional — they exceed the
    *    default only on generated-lake audits.
    */
  private val perQueryBudget: Map[String, Long] = Map(
    "q3_join_topk" -> 48, "q4_order_priority" -> 48, "q5_multi_join" -> 48,
    "q21_waiting_supplier" -> 48,
    "l_ann_ivfadc" -> 32, "l_ann_pq_trained" -> 32,
    "l_contamination" -> 32, "l_decontam_report" -> 32,
  ).map { case (k, v) => k -> v * 1024 * 1024 }

  private def budgetFor(name: String): Long =
    math.max(budgetBytes, perQueryBudget.getOrElse(name, 0L))

  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      // ReusedExchangeExec points back at an exchange already visited
      // through its original parent — don't double-count it
      case _: ReusedExchangeExec => Nil
      case o => o.children
    }
    p.subqueries.foreach(walk(_)(f))
    kids.foreach(walk(_)(f))
  }

  /** Execute `df` fully and return the built size of every
    * BroadcastExchange in the final plan, largest first. Must drive
    * THIS queryExecution's plan (a `df.write` would build a separate
    * QueryExecution and leave these metrics untouched at zero).
    */
  private[graft] def broadcastSizes(df: DataFrame): Seq[Long] = {
    val qe = df.queryExecution
    qe.executedPlan.execute().foreach(_ => ())
    val sizes = Seq.newBuilder[Long]
    walk(qe.executedPlan) {
      case b: BroadcastExchangeExec =>
        sizes += b.metrics.get("dataSize").map(_.value).getOrElse(0L)
      case _ => ()
    }
    sizes.result().sorted.reverse
  }

  test("detector fires on a seeded corpus-side broadcast") {
    val docs = Tables.df(spark, auditDir, "documents")
    // force-broadcast a corpus-proportional POST-EXPLODE side — the
    // exact r10 shape: the generator inflates actual bytes far past
    // the static estimate (docs text is ~1.5 MB at sf0.1; ×40 ≈ 60 MB
    // built), and AQE never demotes the statically-planned BHJ
    val inflated = docs.select(col("doc_id"), col("text"),
      explode(sequence(lit(1), lit(40))).as("k"))
    val seeded = docs.as("a")
      .join(broadcast(inflated).as("b"), "doc_id")
      // consume the replicated payload columns: a bare count(*) lets
      // column pruning strip `text` out of the broadcast relation,
      // shrinking the seed to the long-map floor
      .groupBy().agg(sum(length(col("b.text"))).as("n_bytes"), max(col("b.k")).as("mk"))
    val sizes = broadcastSizes(seeded)
    assert(sizes.nonEmpty, "seeded broadcast not found in executed plan")
    assert(sizes.head > budgetBytes,
      s"seeded corpus broadcast should exceed the $budgetBytes-byte budget, " +
        s"got ${sizes.head} — budget no longer discriminates at $auditDir")
  }

  test("every registered query's executed broadcasts sit under the budget") {
    val violations = Seq.newBuilder[String]
    val largest = Seq.newBuilder[(Long, String)]
    SparkEntry.allQueries.foreach { q =>
      val sizes =
        try broadcastSizes(q.fn(spark, auditDir))
        catch { case e: Throwable =>
          violations += s"${q.name}: failed to execute for audit: ${e.getMessage}"
          Nil
        }
      sizes.headOption.foreach(s => largest += ((s, q.name)))
      sizes.filter(_ > budgetFor(q.name)).foreach { s =>
        violations += f"${q.name}: BroadcastExchange built ${s / 1024.0 / 1024.0}%.1f MB " +
          f"(budget ${budgetFor(q.name) / 1024 / 1024} MB) — corpus-proportional side statically broadcast?"
      }
    }
    // the high-water marks that back the budget choice (visible via -oI)
    largest.result().sorted.reverse.take(5).foreach { case (s, n) =>
      info(f"$n: largest broadcast ${s / 1024.0 / 1024.0}%.2f MB")
    }
    assert(violations.result().isEmpty,
      "broadcast budget violations:\n" + violations.result().mkString("\n"))
  }
}
