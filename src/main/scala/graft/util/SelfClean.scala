package graft.util

import org.apache.spark.sql.DataFrame

/** Self-cleaning lifetime management for a library-internal `persist()`.
  *
  * The library's contract is that a call leaves NO cached partitions
  * behind for the caller to clean up (SURVEY.md §5). Operators that
  * genuinely benefit from an internal cache (ngramJaccard's shingle
  * arrays) register a one-shot listener here instead of leaking the
  * persist: the cache is populated and hit within the one action the
  * caller runs on the result, then released as soon as that action
  * completes.
  *
  * Spark's cache manager AND this listener both key on plan
  * equivalence (`sameResult`), so two back-to-back identical builds
  * would SHARE one cache entry — and the first build's async cleanup
  * could unpersist it under the second build's action. [[buildMarker]]
  * makes each build's cached plan unique (a constant literal column
  * that costs 8 bytes/row cached and is never selected downstream);
  * every registration pairs with one. */
object SelfClean {

  private val build = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Monotonic per-build marker value — add as
    * `.withColumn("__cache_build", lit(SelfClean.buildMarker()))` BEFORE
    * the persist that [[unpersistAfterFirstAction]] will watch. */
  def buildMarker(): Long = build.incrementAndGet()

  /** One-shot self-cleanup for an internal persist: unpersists `cached`
    * as soon as the first action whose plan CONTAINS the cached subtree
    * completes (success or failure), then unregisters itself. Plan
    * containment (`sameResult` on analyzed subtrees) keys the match —
    * callers must ensure the cached plan is unique per build (the
    * [[buildMarker]] column) so one build's completion can never match
    * another's — and unrelated queries on the session never trigger it;
    * the listener bus is async, so the unpersist lands right after the
    * action, not inside it. A build that NEVER runs an action keeps its
    * persist and listener registered for the session (nothing ever
    * completes to trigger cleanup). Everything used here is public API
    * (QueryExecutionListener + Dataset.unpersist). */
  def unpersistAfterFirstAction(cached: DataFrame): Unit = {
    val lm = cached.sparkSession.listenerManager
    val target = cached.queryExecution.analyzed
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private def done(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
        if (qe.analyzed.exists(_.sameResult(target)) && fired.compareAndSet(false, true)) {
          cached.unpersist(blocking = false)
          lm.unregister(this)
        }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = done(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = done(qe)
    }
    lm.register(listener)
  }
}
