package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/**
 * Scoped lifetime for operator-internal persisted frames.
 *
 * Several operators persist intermediates (normed corpora, shingle sets,
 * capped band frames) that the returned lazy DataFrame still references,
 * so the OPERATOR cannot unpersist them — only the caller knows when the
 * terminal action has run. Batch drivers (Verify, Bench) reclaim with
 * `spark.catalog.clearCache()` between queries; that is a sledgehammer a
 * long-lived multi-tenant session cannot swing, because it also evicts
 * every OTHER tenant's caches.
 *
 * `withCached` is the scoped alternative: every engine persist that
 * happens on the current thread inside the scope is registered, and on
 * scope exit each registered frame is unpersisted through the Dataset
 * layer (which also drops its CacheManager entry — no stale catalog
 * state, unlike RDD-level unpersist). Usage:
 *
 * {{{
 *   val pairs = CacheScope.withCached {
 *     Similarity.lshNearDupPairs(embeddings).collect()   // terminal action INSIDE
 *   }
 * }}}
 *
 * Contract: the body must CONSUME its result (collect/write/count) before
 * the scope exits — a lazy DataFrame escaping the scope stays correct
 * (lineage recomputes) but silently loses the persist it was shaped
 * around. Scopes nest (each unpersists only its own registrations) and
 * are PER-THREAD: frames persisted by other threads, or outside any
 * scope, keep the documented session-owned lifetime.
 */
object CacheScope {

  private val stack = new ThreadLocal[List[mutable.ListBuffer[Dataset[_]]]] {
    override def initialValue(): List[mutable.ListBuffer[Dataset[_]]] = Nil
  }

  /** Register `ds` with the innermost active scope; no-op without one. */
  private[graft] def track[T](ds: Dataset[T]): Dataset[T] = {
    stack.get() match {
      case buf :: _ => buf += ds
      case Nil =>
    }
    ds
  }

  /** Number of frames the innermost active scope has registered so far —
    * diagnostic surface for tests and leak audits. */
  def registeredInScope: Int = stack.get() match {
    case buf :: _ => buf.size
    case Nil => -1
  }

  def withCached[A](body: => A): A = {
    stack.set(new mutable.ListBuffer[Dataset[_]] :: stack.get())
    try body
    finally {
      val buf = stack.get().head
      stack.set(stack.get().tail)
      // reverse order: later frames may read earlier ones; blocking=false —
      // eviction is cleanup, not a barrier the caller should wait on
      buf.reverseIterator.foreach(_.unpersist(blocking = false))
    }
  }

  /** `.persist()` that the innermost [[CacheScope.withCached]] scope (if
    * any) will unpersist on exit — the form every ENGINE-internal persist
    * uses. Standalone tools own their sessions and keep raw `.persist()`. */
  implicit final class TrackedPersist[T](private val ds: Dataset[T]) extends AnyVal {
    def persistTracked(): Dataset[T] = track(ds.persist())
    def persistTracked(level: StorageLevel): Dataset[T] = track(ds.persist(level))
  }
}
