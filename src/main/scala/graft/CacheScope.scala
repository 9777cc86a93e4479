package graft

import java.util.concurrent.atomic.AtomicReference

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** Script-lifetime registry for operator-pinned caches.
  *
  * Several operators (`SequencePack`, `TokenBudget`, `ShardExport`,
  * `CosineSimilarity.ivfSelfJoin`, `SignatureStore`) persist an
  * intermediate frame because it is load-bearing: the cache pins a range
  * partitioner's sampled boundaries (or an IVF assignment) so a driver-side
  * collect and the returned plan see the SAME data layout. The `CacheExt`
  * ET persists on explicit user request. Both kinds must eventually be
  * released, or a long-lived session accretes one pinned copy per call —
  * the reference scopes its `SQLCacheExt` persists to the script lifetime
  * for exactly this reason (streamingpro-mlsql/src/main/java/tech/mlsql/
  * ets/SQLCacheExt.scala:38-92).
  *
  * Mechanics: [[graft.dsl.ScriptRunner]] opens a scope around each script
  * run; anything pinned inside is unpersisted in a `finally` when the
  * script ends. Within one scope, every pinned frame survives until scope
  * end — two ShardExport calls in one script no longer evict each other.
  * Outside any scope (operators called directly from tests or pipeline
  * code), [[pin]] falls back to the caller-supplied single-flight
  * `AtomicReference`: the new cache replaces — and unpersists — the
  * previous call's. That keeps the pre-scope behavior for direct use:
  * correct under concurrency (the evicted plan recomputes
  * deterministically, since the RDD lineage and its range-sample seed are
  * fixed at first materialization) but single-consumer for cache HITS.
  *
  * The scope travels via an inheritable thread-local
  * ([[scala.util.DynamicVariable]]), so ET code and driver-side collects
  * issued on the script runner's thread all land in the script's scope.
  * A thread that outlives the script (e.g. a streaming micro-batch loop)
  * sees the scope already closed and falls back — nothing is ever pinned
  * into a dead scope.
  */
object CacheScope {

  final class Scope {
    private val pinned = mutable.Buffer[DataFrame]()
    private var closed = false

    /** Register `df` (already persisted) for release at scope end.
      * Returns false — caller must fall back — once the scope is closed.
      */
    def tryPin(df: DataFrame): Boolean = synchronized {
      if (closed) false
      else { pinned += df; true }
    }

    /** Unpersist everything pinned; idempotent; marks the scope closed. */
    def release(): Unit = synchronized {
      closed = true
      pinned.foreach { df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () } // session already stopped, etc.
      }
      pinned.clear()
    }
  }

  private val current = new scala.util.DynamicVariable[Scope](null)

  /** Run `f` inside a fresh scope; every cache pinned during `f` is
    * unpersisted when `f` completes (normally or not).
    */
  def scoped[T](f: => T): T = {
    val s = new Scope
    try current.withValue(s)(f)
    finally s.release()
  }

  /** Pin a persisted `df` to the enclosing script scope; outside any scope
    * fall back to the operator's single-flight `fallback` register
    * (unpersisting the previous occupant).
    *
    * Same-plan guard: Spark's CacheManager keys entries by CANONICALIZED
    * plan, so when the operator is re-invoked with identical inputs and
    * parameters the new `df.cache()` re-registers the PREVIOUS entry —
    * and unpersisting the previous occupant here would evict the cache the
    * caller just created, silently turning every repeat invocation into a
    * full recompute (the r10 bench's cold/warm pattern). When the evictee
    * would take the new cache with it (`sameResult`), keep it: there is
    * only one entry, so the register swap alone is the right bookkeeping.
    */
  def pin(df: DataFrame, fallback: AtomicReference[DataFrame]): Unit = {
    val s = current.value
    if (s == null || !s.tryPin(df))
      Option(fallback.getAndSet(df))
        .filterNot(_.queryExecution.analyzed.sameResult(df.queryExecution.analyzed))
        .foreach(_.unpersist(false))
  }

  /** Pin with no fallback register (CacheExt's user-requested persist):
    * returns true if a live scope took ownership; false means the persist
    * is session-lifetime and the caller (or the user, via
    * `execute="uncache"`) owns the release.
    */
  def pinIfScoped(df: DataFrame): Boolean = {
    val s = current.value
    s != null && s.tryPin(df)
  }
}
