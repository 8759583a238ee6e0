package graft.sources

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Session-keyed memo with automatic eviction: entries are dropped
  * when the owning SparkContext stops, so a long-lived driver that
  * creates many sessions never retains cached/checkpointed DataFrames
  * of dead sessions for the JVM lifetime.
  */
final class SessionMemo[K, V] {
  private val entries = TrieMap.empty[(SparkSession, K), V]
  private val hooked = TrieMap.empty[SparkSession, Boolean]

  def getOrElseUpdate(s: SparkSession, k: K)(build: => V): V = {
    if (hooked.putIfAbsent(s, true).isEmpty)
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
