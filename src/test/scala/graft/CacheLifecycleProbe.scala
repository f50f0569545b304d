package graft

import org.apache.spark.sql.SparkSession

/** Child-JVM probe for the session-lifecycle cache cleanup (spawned by
  * CacheLifecycleSpec): stopping a SparkContext is JVM-global, so the
  * two-sequential-sessions scenario cannot run inside the shared-session
  * test JVM. Prints ONE `PROBE ...` line the spec asserts on:
  *
  *   during     — vocab entries while session 1 is live (expect 1)
  *   afterStop  — right after session1.stop(), WITHOUT any lookup: only
  *                the application-end listener can have evicted (expect 0)
  *   after2     — after a lookup from session 2 (expect 1: s2's own entry,
  *                no stale entry from s1)
  *   annDuring / annAfterStop — the same for AnnIndex handles.
  */
object CacheLifecycleProbe {

  private def session(): SparkSession = SparkSession.builder()
    .master("local[2]").appName("graft-cache-probe")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def cacheVocab(s: SparkSession, key: String): Unit = {
    import s.implicits._
    val docs = Seq(1L -> "a b c d e", 2L -> "b c d e f").toDF("doc_id", "text")
    graft.operators.Dedup.tokenVocabCached(
      graft.operators.Dedup.shingleRows(docs, 3), Some(key))
  }

  private def cacheAnn(s: SparkSession, key: String): Unit = {
    import s.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.5f, 0.5f)), (3L, Array(-1.0f, 0.2f)))
      .toDF("vec_id", "embedding")
    graft.sources.AnnIndex.forTable(emb, s, key, bits = 2, nCells = 2)
  }

  def main(args: Array[String]): Unit = {
    val s1 = session()
    s1.sparkContext.setLogLevel("ERROR")
    cacheVocab(s1, "probe#one")
    cacheAnn(s1, "probe#ann1")
    val during = graft.operators.Dedup.cachedVocabCount
    val annDuring = graft.sources.AnnIndex.cachedHandleCount
    s1.stop() // posts application end; the listener bus drains before return
    val afterStop = graft.operators.Dedup.cachedVocabCount
    val annAfterStop = graft.sources.AnnIndex.cachedHandleCount
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = session()
    s2.sparkContext.setLogLevel("ERROR")
    cacheVocab(s2, "probe#two")
    val after2 = graft.operators.Dedup.cachedVocabCount
    println(s"PROBE during=$during afterStop=$afterStop after2=$after2 " +
      s"annDuring=$annDuring annAfterStop=$annAfterStop")
    s2.stop()
  }
}
