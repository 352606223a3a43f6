package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Cache lifetime for operators that RETURN a lazy DataFrame built on a
 * cached intermediate (the LSH/banding operators cache the signature /
 * cluster / vector table because it feeds two-to-three scans of one plan).
 * The operator cannot unpersist inline — the caller has not run its action
 * yet — and leaving the cache pinned forever grows executor storage across
 * a many-table run unless the caller remembers `clearCache()` (the round-7
 * nit: Loader unpersists its own caches, the operators relied on the
 * bench's session-wide sweep).
 *
 * [[CacheScope.unpersistAfterAction]] ties the cache to the FIRST action
 * executed over the returned plan: a `QueryExecutionListener` fires on
 * action completion (success or failure), checks that the executed plan
 * contains the operator's result subtree (`sameResult` on the analyzed
 * plan, so caller-added projections/sorts/aggregates on top still match),
 * unpersists, and unregisters itself.
 *
 * Caveats, by design:
 *  - a SECOND action over the same returned frame recomputes without the
 *    cache (correct, just cold) — callers that iterate should cache the
 *    final result themselves;
 *  - if the caller never runs an action the listener self-expires after
 *    [[CacheScope.MaxMissedActions]] non-matching actions (unpersisting
 *    its caches — a later action over the frame recomputes cold, which
 *    is correct). Without the expiry a many-query session accumulated
 *    one live listener per never-actioned operator result, and EVERY
 *    subsequent action paid a full `analyzed.exists(sameResult)` plan
 *    traversal per leaked listener on the listener bus (plus the
 *    retained analyzed plans and cache handles) — the round-17 bench's
 *    410-query sweep is exactly such a session;
 *  - listener dispatch is asynchronous, so the unpersist lands shortly
 *    after the action returns (storage is freed between queries, which is
 *    what the many-table run needs; `blocking = false` keeps it off the
 *    query's critical path).
 */
object CacheScope {

  /** Non-matching actions a listener observes before it gives up,
    * unpersists its caches and unregisters. Generous: the orchestrated
    * composites (e2e_*, pipeline loads) legitimately run a few hundred
    * actions between building an operator result and consuming it, so
    * the bound sits well above any real query's action count — the
    * expiry only catches results that were built and then abandoned
    * (64 was measured to evict live caches inside e2e rows). */
  val MaxMissedActions: Int = 512

  def unpersistAfterAction(result: DataFrame, caches: Seq[DataFrame]): DataFrame = {
    val spark = result.sparkSession
    val target = result.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      @volatile private var done = false
      @volatile private var missed = 0
      private def expire(): Unit = {
        done = true
        caches.foreach(_.unpersist(blocking = false))
        spark.listenerManager.unregister(this)
      }
      private def fire(qe: QueryExecution): Unit =
        if (!done) {
          if (qe.analyzed.exists(_.sameResult(target))) expire()
          else {
            missed += 1
            if (missed >= MaxMissedActions) expire()
          }
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = fire(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = fire(qe)
    }
    spark.listenerManager.register(listener)
    result
  }
}
