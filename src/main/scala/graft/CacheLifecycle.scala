package graft

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Explicit lifecycle for operator-persisted intermediates.
  *
  * `Dataset.persist()` registers the plan in the session's CacheManager,
  * which holds it until an explicit `unpersist()` — the ContextCleaner
  * never reclaims it, no matter how unreachable the DataFrame becomes. An
  * operator that persists a shared stage (the dedup/DSIR/skew family) and
  * returns a lazy result therefore leaks one cached stage per call into
  * any long-lived session (Verify's 132-query sweep, a BiServe endpoint);
  * at 100 TB a leaked persist is executor-memory stolen from every later
  * query.
  *
  * The operators cannot release eagerly themselves: their returned
  * DataFrames still reference the persisted stage, and forcing
  * materialization inside the operator would hide the physical plan the
  * specs and plan audits assert on. So the lifecycle is split:
  *
  *  - operators call [[TrackedPersistOps.persistTracked]] instead of bare
  *    `persist()` — same caching behavior, plus registration in a
  *    session-scoped ledger;
  *  - the session owner calls [[releaseAll]] once the operator's output is
  *    materialized (Verify between queries, Bench between queries via
  *    `clearCache`, a BiServe admin on demand). Release is non-blocking
  *    and idempotent.
  *
  * Eviction note: persisted blocks use MEMORY_AND_DISK with LRU eviction,
  * so an unreleased cache degrades (spills, evicts) rather than OOMs —
  * releaseAll turns that degradation into deterministic reclamation.
  */
object CacheLifecycle {
  private val tracked =
    new ConcurrentHashMap[SparkSession, ConcurrentLinkedQueue[Dataset[_]]]()

  implicit class TrackedPersistOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** `persist()` + registration in the owning session's ledger. */
    def persistTracked(): Dataset[T] = {
      tracked.computeIfAbsent(ds.sparkSession,
        _ => new ConcurrentLinkedQueue[Dataset[_]]()).add(ds)
      ds.persist()
    }
  }

  /** Unpersist every intermediate the session's operators registered.
    * Non-blocking (block deletion proceeds asynchronously) and safe to
    * call at any time: an in-flight query that still references a released
    * stage recomputes it from lineage instead of failing. */
  def releaseAll(spark: SparkSession): Unit = {
    val q = tracked.remove(spark)
    if (q != null) q.forEach(_.unpersist(blocking = false))
  }

  /** Currently-registered (not yet released) intermediates for a session. */
  def trackedCount(spark: SparkSession): Int = {
    val q = tracked.get(spark)
    if (q == null) 0 else q.size()
  }
}
