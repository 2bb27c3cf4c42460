package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracks operator-internal persisted tables so a COMPOSING caller can
  * release them once its own downstream results are materialized or
  * checkpoint-cut. Library operators can't unpersist what their returned
  * lazy plans still reference; a scope gives the owner of the final action
  * the handles. In a long-lived session (notebook, service), releasing the
  * scope after each pipeline run is what keeps repeated runs from
  * accumulating executor storage.
  *
  * {{{
  *   val scope = new CacheScope
  *   val pairs = Dedup.ngramJaccard(docs, "text", "id", scope = scope)
  *   ... // consume pairs fully (count / write / checkpoint)
  *   scope.release()
  * }}}
  */
class CacheScope {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  protected def record(df: DataFrame): Unit = synchronized { tracked += df }

  /** Persist `df` at `level` (no-op for `StorageLevel.NONE`) and remember
    * the handle for [[release]]. */
  private[graft] def persisted(df: DataFrame, level: StorageLevel): DataFrame =
    if (level == StorageLevel.NONE) df
    else { df.persist(level); record(df); df }

  /** Unpersist (non-blocking) everything registered in this scope. */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }
}

object CacheScope {
  /** Session-lifetime caches: persists without keeping handles — the
    * default when no scope is passed, matching callers that own the cache
    * lifecycle themselves (`spark.catalog.clearCache()` or session end). */
  val untracked: CacheScope = new CacheScope {
    override protected def record(df: DataFrame): Unit = ()
  }
}
