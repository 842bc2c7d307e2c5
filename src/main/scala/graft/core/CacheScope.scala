package graft.core

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame

/** Scoped cache lifecycle for library-internal `.cache()` calls.
  *
  * Operators like MinHash dedup and IVF search cache intermediate
  * projections because several join sides consume them (re-deriving a
  * signature per consumer was measured at ~18 s of a 22 s query). Those
  * caches must OUTLIVE the operator function — the returned DataFrame is
  * lazy and the action runs later — so the library cannot unpersist them
  * itself. Historically the lifecycle was caller-owned
  * (`spark.catalog.clearCache()`), which the bench/verify harnesses do
  * per query, but a pipeline composing two operators silently
  * accumulated cached corpora.
  *
  * [[withCached]] closes that footgun: every cache created via
  * [[cached]] inside the scope (i.e. by any graft operator the body
  * calls) is unpersisted when the scope exits. Run the ACTION inside the
  * body — a DataFrame returned out of the scope stays correct (a cache
  * is only an optimization) but recomputes from source when used.
  *
  * {{{
  * val clusters = CacheScope.withCached {
  *   Dedup.nearDupClusters(docs, "doc_id", "text", 0.9).collect()
  * } // all operator-internal caches released here
  * }}}
  *
  * Scopes are per-thread (the DataFrame-building thread registers its
  * caches); nesting unpersists each cache at its owning scope's exit.
  * With no active scope, behavior is unchanged: caches persist until the
  * caller clears them.
  */
object CacheScope {

  private val active = new ThreadLocal[ListBuffer[DataFrame]]

  /** `df.cache()` registered with the innermost active scope (plain
    * cache when none is active). All graft operators cache through this.
    */
  def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    val buf = active.get()
    if (buf != null) buf += c
    c
  }

  /** Run `body`, then unpersist every [[cached]] DataFrame it created
    * (non-blocking, best-effort — an already-stopped session is ignored).
    */
  def withCached[A](body: => A): A = {
    val outer = active.get()
    val buf = ListBuffer.empty[DataFrame]
    active.set(buf)
    try body
    finally {
      if (outer != null) active.set(outer) else active.remove()
      buf.foreach { df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }
  }
}
