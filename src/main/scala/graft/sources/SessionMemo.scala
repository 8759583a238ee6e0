package graft.sources

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Session-keyed memo with automatic eviction: entries are dropped
  * when the owning SparkContext stops (listener), and every access
  * also purges entries whose context has already stopped — so a
  * long-lived driver that creates contexts over time never retains
  * cached/checkpointed DataFrames of dead ones for the JVM lifetime.
  *
  * `maxPerSession` bounds how many entries ONE live session can hold
  * (a long-lived session memoizing per-corpus artifacts — e.g. cached
  * near-dup pair tables — must not grow without bound): inserting
  * past the cap evicts that session's oldest entries, handing each to
  * `onEvict` (where a cached DataFrame gets its `unpersist`).
  *
  * Limitation (by Spark's design): sibling sessions sharing one LIVE
  * context (`newSession()`) have no stop event of their own, so their
  * entries live until that context ends — bounded by context
  * lifetime, not JVM lifetime.
  */
final class SessionMemo[K, V](maxPerSession: Int = Int.MaxValue,
    onEvict: V => Unit = (_: V) => ()) {
  private val entries = TrieMap.empty[(SparkSession, K), V]
  private val hooked = TrieMap.empty[SparkSession, Boolean]
  // insertion order per memo — the eviction queue (oldest first)
  private val order =
    new java.util.concurrent.ConcurrentLinkedQueue[(SparkSession, K)]

  private def purgeDead(): Unit = {
    entries.filterInPlace { case ((owner, _), _) =>
      !owner.sparkContext.isStopped
    }
    // the order queue must shed dead sessions too: its tuples pin the
    // stopped SparkSession graph for the JVM's lifetime otherwise,
    // and evictOldest degrades scanning ever more dead heads
    order.removeIf { case (owner, _) => owner.sparkContext.isStopped }
  }

  def getOrElseUpdate(s: SparkSession, k: K)(build: => V): V = {
    purgeDead()
    // a stopped context cannot register listeners (and its entries
    // would be unusable anyway) — let the build surface Spark's error
    if (!s.sparkContext.isStopped &&
        hooked.putIfAbsent(s, true).isEmpty)
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd)
            : Unit = {
          entries.filterInPlace { case ((owner, _), _) => owner ne s }
          order.removeIf { case (owner, _) => owner eq s }
          hooked.remove(s)
        }
      })
    // Not getOrElseUpdate: two racing builders would both evaluate the
    // thunk, and the loser's already-materialized value (e.g. a
    // cache()+count()'d frame) would leak without passing through
    // onEvict, plus leave a duplicate order entry that later evicts a
    // live key early. putIfAbsent lets the loser clean up after itself.
    val v = entries.get((s, k)) match {
      case Some(existing) => existing
      case None =>
        val built = build
        entries.putIfAbsent((s, k), built) match {
          case Some(winner) => onEvict(built); winner
          case None => order.add((s, k)); built
        }
    }
    // cap: evict this session's oldest entries (never the one just
    // read/inserted) until within bound
    while (entries.keysIterator.count(_._1 eq s) > maxPerSession &&
        evictOldest(s, keep = (s, k))) {}
    v
  }

  private def evictOldest(s: SparkSession, keep: (SparkSession, K))
      : Boolean = {
    val it = order.iterator()
    while (it.hasNext) {
      val key = it.next()
      if ((key._1 eq s) && key != keep) {
        it.remove()
        entries.remove(key).foreach(onEvict)
        return true
      }
    }
    false
  }

  /** Visible for tests. */
  private[graft] def size: Int = entries.size
}
