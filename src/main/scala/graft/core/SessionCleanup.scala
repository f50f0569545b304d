package graft.core

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Shared lifecycle cleanup for session-scoped caches (Dedup.vocabCache,
  * AnnIndex.handles — one registration each, not one copy of this logic
  * each). Two layers:
  *
  *  - every hooked SparkContext gets ONE application-end listener that
  *    runs all registered sweeps (a stopped context's persisted blocks
  *    are already gone, so sweeping the maps is the whole cleanup);
  *  - caches also call their sweep at lookup time — the listener bus is
  *    async, so a lookup can race the onApplicationEnd delivery.
  */
object SessionCleanup {

  private val sweeps = new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()
  private val hooked = TrieMap.empty[String, Boolean]

  /** Register a cache's sweep thunk — called once from the cache owner's
    * object initializer. */
  def registerSweep(sweep: () => Unit): Unit = sweeps.add(sweep)

  /** Hook a session's context (idempotent per context): application end
    * runs every registered sweep. */
  def hook(s: SparkSession): Unit =
    hooked.getOrElseUpdate(
      s.sparkContext.applicationId + "#" +
        System.identityHashCode(s.sparkContext), {
        s.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            sweeps.forEach(f => f())
        })
        true
      })
}
