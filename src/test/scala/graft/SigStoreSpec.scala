package graft

import graft.operators.Dedup
import graft.sources.SigStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The persisted minhash-signature store (the dedup analog of AnnIndex):
  * build-once / reopen-validated durability — the VOCABULARY shipping as
  * part of the artifact — and the guarantee that the delta keep-list path
  * reads stored signatures instead of re-shingling the old corpus. */
class SigStoreSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sig").resolve("store").toString

  test("build → reopen round-trip; stale corpus, vocab or meta rebuilds") {
    val docs = Seq(1L -> "a b c d e", 2L -> "c d e f g", 3L -> "x y z w v")
      .toDF("doc_id", "text")
    def vocabOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.tokenVocab(Dedup.shingleRows(d, 3))
    val path = tmp()
    val built = SigStore.build(docs, path, vocabOf(docs))
    val direct = Dedup.minhashSignaturesPortable(docs, 3, 16)
    assert(built.collect().toSet == direct.collect().toSet,
      "the stored table must equal the direct signature computation")
    // the vocabulary round-trips as part of the artifact
    assert(SigStore.loadVocab(spark, path).collect().toSet ==
      vocabOf(docs).collect().toSet)
    assert(SigStore.storedRows(path).contains(3L))
    // validated reopen: same source + vocab → load, no rebuild
    val meta = Paths.get(path, SigStore.MetaFile)
    val mtime = Files.getLastModifiedTime(meta)
    SigStore.forCorpus(docs, path, vocabOf(docs)).count()
    assert(Files.getLastModifiedTime(meta) == mtime, "unchanged source must reopen")
    // a DIFFERENT vocabulary over the same corpus must rebuild — stored
    // signatures are functions of the vocab, serving them would be stale
    val otherVocab = vocabOf(docs).withColumn("tid", col("tid") + lit(1000L))
    SigStore.forCorpus(docs, path, otherVocab).count()
    assert(Files.getLastModifiedTime(meta) != mtime,
      "a vocabulary change must trigger a rebuild")
    // a text edit (same ids, same count) must trigger a rebuild
    val edited = Seq(1L -> "a b c d e", 2L -> "c d e f g", 3L -> "EDITED y z w v")
      .toDF("doc_id", "text")
    val rebuilt = SigStore.forCorpus(edited, path, vocabOf(edited))
    assert(rebuilt.collect().toSet ==
      Dedup.minhashSignaturesPortable(edited, 3, 16).collect().toSet,
      "a content change must rebuild, never serve stale signatures")
    // corrupt meta → rebuild, not a crash or a stale serve
    Files.writeString(meta, "garbage\n")
    assert(SigStore.forCorpus(edited, path, vocabOf(edited)).count() == 3)
    assert(SigStore.forCorpus(edited, path, vocabOf(edited)).columns.contains("h0"))
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
    val key = s"sigspec#${java.util.UUID.randomUUID()}"
    val vocab = Dedup.tokenVocabCached(Dedup.shingleRows(all, 3), Some(key))

    val oldDf = old.toDF("doc_id", "text")
    val oldKeep = Dedup.keepList(oldDf, minSharedPct = 80, vocabKey = Some(key))
    assert(oldKeep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 10L -> 10L), "old clusters must start separate")
    val path = tmp()
    val store = SigStore.forCorpus(oldDf, path, vocab)

    def reversed(t: String) = t.split(" ").reverse.mkString(" ")
    val allReversedOld = (old.map { case (id, t) => id -> reversed(t) } ++ news)
      .toDF("doc_id", "text")
    val newIds = Seq(20L, 21L).toDF("doc_id")

    // store-backed delta: old signatures come from parquet, so the
    // reversed old text is irrelevant — the merge must happen
    val withStore = Dedup.keepListDelta(oldKeep, allReversedOld, newIds,
        minSharedPct = 80, vocabKey = Some(key), oldSigs = Some(store))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.keepList((old ++ news).toDF("doc_id", "text"),
        minSharedPct = 80, vocabKey = Some(key))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == Map(1L -> 1L, 10L -> 1L, 20L -> 1L, 21L -> 1L))
    assert(withStore == full,
      s"store-backed delta must equal the full recompute: $withStore")

    // control: WITHOUT the store the delta re-shingles the (reversed) old
    // text and the old↔new candidates vanish — old clusters stay separate
    val without = Dedup.keepListDelta(oldKeep, allReversedOld, newIds,
        minSharedPct = 80, vocabKey = Some(key))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(without(1L) == 1L && without(10L) == 10L,
      s"the control proves re-shingling would have broken the merge: $without")

    // and the candidate plan reads the STORE's parquet, not a second
    // signature pipeline over old text
    val edges = Dedup.lshVerifiedDupsPortableDelta(allReversedOld, newIds,
      vocabKey = Some(key), oldSigs = Some(store))
    assert(edges.queryExecution.executedPlan.toString.contains(
      Paths.get(path).getFileName.toString),
      "the delta candidate join must scan the persisted signature table")
  }

  test("the shipped artifact alone drives a next-day delta (CurationJob recipe)") {
    // day 0: the job persists signatures + vocabulary for its corpus.
    // day 1: a FRESH consumer primes its session cache from the artifact
    // (loadVocab → primeVocabCache) and closes the delta against the
    // stored signatures — no state shared except the directory on disk.
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val apx = (1 to 8).map(i => s"z$i")
    val old = Seq(1L -> base, 10L -> (base + " " + apx.mkString(" ")))
    val oldDf = old.toDF("doc_id", "text")
    val path = tmp()
    SigStore.build(oldDf, path, Dedup.tokenVocab(Dedup.shingleRows(oldDf, 3)))
    val oldKeep = oldDf.select(col("doc_id"), col("doc_id").as("keep_id"))

    val news = Seq(
      20L -> (base + " " + apx.take(4).mkString(" ")),
      21L -> (base + " " + apx.take(6).mkString(" ")))
    val all = (old ++ news).toDF("doc_id", "text")
    val dayKey = s"recipe#${java.util.UUID.randomUUID()}"
    Dedup.primeVocabCache(dayKey, SigStore.loadVocab(spark, path))
    val delta = Dedup.keepListDelta(oldKeep, all,
        Seq(20L, 21L).toDF("doc_id"), minSharedPct = 80,
        vocabKey = Some(dayKey), oldSigs = Some(SigStore.load(spark, path)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(delta == Map(1L -> 1L, 10L -> 1L, 20L -> 1L, 21L -> 1L),
      s"the artifact-driven delta must merge through the bridge chain: $delta")
  }
}
