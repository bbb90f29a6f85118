package graft

import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.util.QueryExecutionListener

/** Mechanical scale audit over EVERY registered query — the two
  * plan-shape failure classes the per-round reviews hunt by hand,
  * automated so a refactor can't sneak one in:
  *
  *  1. `CartesianProductExec` anywhere (subqueries included): an
  *     unkeyed all-pairs join is never acceptable — every
  *     pair-generating operator must go through a keyed join (LSH
  *     bands, posting lists, fingerprints, buckets). Scalar 1-row
  *     broadcasts plan as BroadcastNestedLoopJoin and don't trip this.
  *  2. Unpartitioned `WindowExec` (empty PARTITION BY): moves the
  *     whole input through one task. Allowed ONLY where the window's
  *     input is provably bounded by something other than data volume
  *     (a wall-clock grid, the source list, the vocabulary) — those
  *     queries are whitelisted WITH their bound, and the whitelist
  *     self-expires: an entry whose query no longer plans a global
  *     window fails the spec, so stale justifications can't linger.
  *
  * COVERAGE (ADVICE r14): `localCheckpoint()` is eager, so the final
  * `executedPlan` shows pre-checkpoint pipeline segments only as
  * opaque LogicalRDD scans — the segment where r14's kernel-in-filter
  * duplication actually lived. A QueryExecutionListener therefore
  * captures EVERY QueryExecution the query's CONSTRUCTION runs
  * (checkpoint cuts, isEmpty convergence probes, limit(1) collects all
  * go through withAction) and both audits walk the captured plans too.
  * The listener bus is asynchronous; [[Shim.drainListenerBus]] fences
  * each collection.
  *
  * Plans are built (and AQE finalized by the builders' own eager
  * steps where present) at sf0.001 — the SHAPE is SF-invariant; the
  * budget probes in PLANS.md cover the magnitudes.
  */
class ScaleInvariantSpec extends SparkSpec {

  /** query → why its global window's input is bounded (the documented
    * exception class from PLANS.md / SURVEY §4).
    */
  private val globalWindowBounds: Map[String, String] = Map(
    "m_trace_events" -> "per-trace event rows of ONE process (JIT instance)",
    "m_perfetto_packets" -> "packet sequencing over per-process chunk rows",
    "m_props_dict" -> "distinct property SETS (dictionary, ≪ rows)",
    "m_funnel" -> "per-user step grid after per-user reduction",
    "m_error_bursts" -> "minute grid (wall-clock bounded)",
    "m_incident_context" -> "burst islands over the minute grid (wall-clock bounded)",
    "m_concurrency" -> "minute grid (wall-clock bounded, aggregate-below-window pinned)",
    "m_series_novelty" -> "day grid after series-grain election",
    "m_error_budget" -> "day grid",
    "l_bigram_lm" -> "continuation-type rows (vocabulary-bounded)",
    "l_token_apportion" -> "source list",
    "l_vocab_curve" -> "vocabulary types (PLANS.md documents the bound)",
    "m_top_talkers" -> "process grid (fleet-bounded, counts pre-aggregated map-side)",
    "l_keyword_topk" -> "term election over the type table (vocabulary-bounded) + rank over the top-20 rows",
    "l_novelty_curve" -> "day grid of first-appearance counts",
    "l_dedup_ladder" -> "the 4-row rung-summary table (lag over stage labels)",
    "l_mixture_epochs" -> "source list")

  /** Construction-time global windows additionally justified by a
    * bound the FINAL plan doesn't show (driver-loop internals that
    * never reach the query's own executed plan). Currently empty —
    * first run of the captured-plan walk found none; the mechanism
    * (and its self-expiry below) stays for the first one that appears.
    */
  private val constructionWindowBounds: Map[String, String] = Map(
    "m_saturation" -> ("minute-grid prefix sum (wall-clock bounded, m_concurrency's class) " +
      "in the pre-checkpoint sweep-line segment"))

  private val captured = new java.util.concurrent.ConcurrentLinkedQueue[QueryExecution]()

  private lazy val installListener: Unit =
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.add(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })

  /** The query's final executed plan PLUS every plan its construction
    * executed eagerly (pre-checkpoint segments, loop bodies).
    */
  private def allPlans(q: GraftQuery): Seq[SparkPlan] = {
    installListener
    Shim.drainListenerBus(spark)
    captured.clear()
    val finalPlan = q.fn(spark, sfDir).queryExecution.executedPlan
    Shim.drainListenerBus(spark)
    import scala.jdk.CollectionConverters._
    finalPlan +: captured.asScala.toList.map(_.executedPlan)
  }

  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case o => o.children
    }
    p.subqueries.foreach(walk(_)(f))
    kids.foreach(walk(_)(f))
  }

  test("no cartesian products; global windows only where input is grid/vocab-bounded") {
    val violations = Seq.newBuilder[String]
    val sawGlobal = Set.newBuilder[String]
    val sawConstructionGlobal = Set.newBuilder[String]
    SparkEntry.allQueries.foreach { q =>
      val plans = allPlans(q)
      var cart = 0; var gwFinal = 0; var gwConstruction = 0
      plans.zipWithIndex.foreach { case (plan, i) =>
        walk(plan) {
          case _: CartesianProductExec => cart += 1
          case w: WindowExec if w.partitionSpec.isEmpty =>
            if (i == 0) gwFinal += 1 else gwConstruction += 1
          case _ => ()
        }
      }
      if (cart > 0) violations += s"${q.name}: $cart CartesianProductExec"
      if (gwFinal > 0) {
        sawGlobal += q.name
        if (!globalWindowBounds.contains(q.name))
          violations += s"${q.name}: $gwFinal unpartitioned WindowExec (not whitelisted)"
      }
      if (gwConstruction > 0) {
        sawConstructionGlobal += q.name
        if (!globalWindowBounds.contains(q.name) &&
            !constructionWindowBounds.contains(q.name))
          violations += s"${q.name}: $gwConstruction unpartitioned WindowExec in a " +
            "construction-time (pre-checkpoint) plan segment (not whitelisted)"
      }
    }
    val stale = globalWindowBounds.keySet -- sawGlobal.result()
    assert(stale.isEmpty, s"whitelist entries with no global window anymore: $stale")
    val staleC = constructionWindowBounds.keySet -- sawConstructionGlobal.result()
    assert(staleC.isEmpty,
      s"construction-window whitelist entries with no construction-time global window anymore: $staleC")
    assert(violations.result().isEmpty,
      "scale invariants violated:\n" + violations.result().mkString("\n"))
  }

  /** Per-row-expensive kernels: a byte scan or a digest chain per row.
    * Cheap scalar kernels (graft_round, graft_property_get, graft_dot,
    * graft_l2sq) are legitimate in predicates and excluded. Matching is
    * word-boundary (ADVICE r14): plain substring `contains` misfires on
    * prefix-sharing names (graft_minhash inside graft_minhash_h56).
    */
  private val expensiveKernels = Seq("graft_shingles", "graft_minhash",
    "graft_minhash_h56", "graft_hash56", "graft_textstats",
    "graft_normalize", "graft_md5min", "graft_pq_encode", "graft_tokens")

  private val kernelRegexes: Seq[(String, scala.util.matching.Regex)] =
    expensiveKernels.map(k => k -> s"\\b${java.util.regex.Pattern.quote(k)}\\b".r)

  private def kernelsIn(s: String): Seq[String] =
    kernelRegexes.collect { case (k, re) if re.findFirstIn(s).isDefined => k }

  test("no expensive kernel inside a Filter: the pushdown-duplication net") {
    // Round-14 shipped a measured 1.45x regression for one bench run:
    // a drop-empties filter on the fused kernel's struct output was
    // predicate-pushed below its projection, so the WHOLE
    // shingle+digest kernel evaluated twice per row (Filter + Project
    // — whole-stage codegen eliminates common subexpressions only
    // WITHIN one operator). The shape generalizes: an expensive kernel
    // inside ANY FilterExec condition means either that duplication or
    // a filter doing per-row kernel work a projection should own —
    // both wrong. ShingleKernelSpec pins the one fixed site; this net
    // pins every registered query INCLUDING pre-checkpoint segments
    // (where the r14 duplication actually lived), so the next refactor
    // fails a test, not a bench round.
    val violations = Seq.newBuilder[String]
    SparkEntry.allQueries.foreach { q =>
      allPlans(q).foreach { plan =>
        walk(plan) {
          case f: org.apache.spark.sql.execution.FilterExec =>
            val cond = f.condition.toString
            kernelsIn(cond).foreach { k =>
              violations += s"${q.name}: $k inside Filter: ${cond.take(120)}"
            }
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            val df = s.dataFilters.mkString(";")
            kernelsIn(df).foreach { k =>
              violations += s"${q.name}: $k inside scan DataFilters: ${df.take(120)}"
            }
          case _ => ()
        }
      }
    }
    assert(violations.result().isEmpty,
      "expensive kernel evaluating inside a filter (likely duplicated " +
        "against its projection by predicate pushdown):\n" +
        violations.result().mkString("\n"))
  }
}
