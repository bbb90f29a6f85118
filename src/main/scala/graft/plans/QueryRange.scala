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
  private val tl = new ThreadLocal[(Option[Long], Option[Long])] {
    override def initialValue: (Option[Long], Option[Long]) = (None, None)
  }

  def set(beginMicros: Option[Long], endMicros: Option[Long]): Unit =
    tl.set((beginMicros, endMicros))

  def clear(): Unit = tl.remove()

  /** (beginMicros, endMicros) for the current thread; (None, None) when unset. */
  def get: (Option[Long], Option[Long]) = tl.get()
}
