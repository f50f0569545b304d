package graft

import graft.operators.Dedup
import graft.sources.SigStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The persisted minhash-signature store (the dedup analog of AnnIndex):
  * build-once / reopen-validated durability, and the guarantee that the
  * delta keep-list path reads stored signatures instead of re-shingling
  * the old corpus. */
class SigStoreSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sig").resolve("store").toString

  test("build → reopen round-trip; stale or corrupt meta rebuilds") {
    val docs = Seq(1L -> "a b c d e", 2L -> "c d e f g", 3L -> "x y z w v")
      .toDF("doc_id", "text")
    val path = tmp()
    val built = SigStore.build(docs, path)
    val direct = Dedup.minhashSignaturesPortable(docs, 3, 16)
    assert(built.collect().toSet == direct.collect().toSet,
      "the stored table must equal the direct signature computation")
    // validated reopen: same source → load, no rebuild (meta mtime fixed)
    val meta = Paths.get(path, SigStore.MetaFile)
    val mtime = Files.getLastModifiedTime(meta)
    SigStore.forCorpus(docs, path).count()
    assert(Files.getLastModifiedTime(meta) == mtime, "unchanged source must reopen")
    // a text edit (same ids, same count) must trigger a rebuild
    val edited = Seq(1L -> "a b c d e", 2L -> "c d e f g", 3L -> "EDITED y z w v")
      .toDF("doc_id", "text")
    val rebuilt = SigStore.forCorpus(edited, path)
    assert(rebuilt.collect().toSet ==
      Dedup.minhashSignaturesPortable(edited, 3, 16).collect().toSet,
      "a content change must rebuild, never serve stale signatures")
    // corrupt meta → rebuild, not a crash or a stale serve
    Files.writeString(meta, "garbage\n")
    assert(SigStore.forCorpus(edited, path).count() == 3)
    assert(SigStore.forCorpus(edited, path).columns.contains("h0"))
  }

  test("delta with a store never re-shingles old text; without one it must") {
    // old corpus: two separate clusters {1} and {10}; the delta's bridge
    // chain 20—21 merges them (the Coverage2Spec geometry). The old docs'
    // words are then REVERSED in the delta-visible corpus: word SETS (and
    // so Jaccard verification) are unchanged, but shingles are destroyed —
    // any path that re-shingles old text loses the old↔new LSH candidates
    // and fails to merge. The store-backed delta must still equal the
    // full recompute over the ORIGINAL corpus.
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val apx = (1 to 8).map(i => s"z$i")
    val old = Seq(1L -> base, 10L -> (base + " " + apx.mkString(" ")))
    val news = Seq(
      20L -> (base + " " + apx.take(4).mkString(" ")),
      21L -> (base + " " + apx.take(6).mkString(" ")))
    val all = (old ++ news).toDF("doc_id", "text")
    val key = Some(s"sigspec#${java.util.UUID.randomUUID()}")
    Dedup.tokenVocabCached(Dedup.shingleRows(all, 3), key)

    val oldDf = old.toDF("doc_id", "text")
    val oldKeep = Dedup.keepList(oldDf, minSharedPct = 80, vocabKey = key)
    assert(oldKeep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 10L -> 10L), "old clusters must start separate")
    val path = tmp()
    val store = SigStore.forCorpus(oldDf, path, vocabKey = key)

    def reversed(t: String) = t.split(" ").reverse.mkString(" ")
    val allReversedOld = (old.map { case (id, t) => id -> reversed(t) } ++ news)
      .toDF("doc_id", "text")
    val newIds = Seq(20L, 21L).toDF("doc_id")

    // store-backed delta: old signatures come from parquet, so the
    // reversed old text is irrelevant — the merge must happen
    val withStore = Dedup.keepListDelta(oldKeep, allReversedOld, newIds,
        minSharedPct = 80, vocabKey = key, oldSigs = Some(store))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.keepList((old ++ news).toDF("doc_id", "text"),
        minSharedPct = 80, vocabKey = key)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == Map(1L -> 1L, 10L -> 1L, 20L -> 1L, 21L -> 1L))
    assert(withStore == full,
      s"store-backed delta must equal the full recompute: $withStore")

    // control: WITHOUT the store the delta re-shingles the (reversed) old
    // text and the old↔new candidates vanish — old clusters stay separate
    val without = Dedup.keepListDelta(oldKeep, allReversedOld, newIds,
        minSharedPct = 80, vocabKey = key)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(without(1L) == 1L && without(10L) == 10L,
      s"the control proves re-shingling would have broken the merge: $without")

    // and the candidate plan reads the STORE's parquet, not a second
    // signature pipeline over old text
    val edges = Dedup.lshVerifiedDupsPortableDelta(allReversedOld, newIds,
      vocabKey = key, oldSigs = Some(store))
    assert(edges.queryExecution.executedPlan.toString.contains(
      Paths.get(path).getFileName.toString),
      "the delta candidate join must scan the persisted signature table")
  }
}
