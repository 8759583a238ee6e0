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
  * Limitation (by Spark's design): sibling sessions sharing one LIVE
  * context (`newSession()`) have no stop event of their own, so their
  * entries live until that context ends — bounded by context
  * lifetime, not JVM lifetime.
  */
final class SessionMemo[K, V] {
  private val entries = TrieMap.empty[(SparkSession, K), V]
  private val hooked = TrieMap.empty[SparkSession, Boolean]

  private def purgeDead(): Unit =
    entries.filterInPlace { case ((owner, _), _) =>
      !owner.sparkContext.isStopped
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
          hooked.remove(s)
        }
      })
    entries.getOrElseUpdate((s, k), build)
  }

  /** Visible for tests. */
  private[graft] def size: Int = entries.size
}
