package graft.plans

/** Per-thread query time range — the channel [[graft.Graft.query]] uses
  * to hand a range to [[TimeRangeRewrite]].
  *
  * Session conf cannot carry a per-query range safely: ANY derived
  * Dataset (limit/select inside head(), count(), ...) re-runs the
  * analyzer at action time on whatever thread touches it, re-applying
  * the rewrite under whatever conf is live right then — so a range
  * set by one thread leaks into plans analyzed concurrently by others,
  * and no lock around the original analysis can cover those later
  * re-analyses. A thread-local scopes the range to exactly the code
  * between set() and clear() on the calling thread: re-analyses
  * elsewhere see no range and leave already-scoped plans untouched
  * (the rewrite is structurally idempotent). This mirrors the
  * reference, which threads query_range through per-query context
  * (rust/analytics/src/lakehouse/query.rs) rather than mutating
  * session state.
  */
object QueryRange {
  private val tl = new ThreadLocal[Option[(Option[Long], Option[Long])]] {
    override def initialValue: Option[(Option[Long], Option[Long])] = None
  }

  /** Declare this thread's per-query range. Tri-state matters:
    * set(None, None) means "this query is EXPLICITLY unranged" — the
    * rule must not fall back to a static conf range for it — while an
    * absent thread-local (no query() in flight) lets the conf apply.
    */
  def set(beginMicros: Option[Long], endMicros: Option[Long]): Unit =
    tl.set(Some((beginMicros, endMicros)))

  def clear(): Unit = tl.remove()

  /** Some((begin, end)) while a query() is in flight on this thread;
    * None otherwise.
    */
  def get: Option[(Option[Long], Option[Long])] = tl.get()
}
