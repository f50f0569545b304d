package graft.sources

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** MATERIALIZED minhash-signature store — the dedup analog of [[AnnIndex]].
  *
  * [[Dedup.keepListDelta]] restricts the QUADRATIC stage of a daily dedup
  * delta to new-vs-all, but without a store the LINEAR stage — minhash
  * signatures of the old corpus — is recomputed on every delta: a full
  * re-shingle of 100 TB of old text per day. This object persists the
  * signature table once (one narrow k×8-byte row per doc, written next to
  * the keep-list), fingerprints the source corpus, and serves the stored
  * rows back to every delta; the delta then shingles ONLY the new batch
  * (spec-asserted in SigStoreSpec: the old text is never re-shingled).
  *
  * Validity contract: signatures must be comparable across the old run
  * and the delta. With the production xxhash64 family they are corpus-
  * independent, so a stored table is unconditionally reusable. With the
  * portable LCG family (the oracle-checkable catalog path) signatures are
  * functions of the staged token vocabulary — build and read the store
  * under the SAME `vocabKey` the delta uses (the same contract
  * [[Dedup.keepListDelta]] already documents for its edge sources).
  *
  * Same durability pattern as AnnIndex: an atomic meta sidecar doubles as
  * the commit marker (a crashed build is invisible), reopen validates a
  * content fingerprint of the source (count, min/max doc_id, XOR of
  * per-row (doc_id, text) hashes), and a missing/corrupt/stale sidecar
  * triggers a rebuild — never a stale serve, never a permanent failure.
  */
object SigStore {

  val MetaFile = "_graft_sig_meta.txt"

  /** Content fingerprint of the source corpus: one narrow aggregation,
    * no shuffle beyond the final combine. bit_xor is order-independent
    * and overflow-free under ANSI; hashing (doc_id, text) together
    * catches both text edits and id reassignment. */
  def fingerprint(docs: DataFrame): (Long, Long, Long, Long) = {
    val r = docs.agg(count(lit(1)), min(col("doc_id")), max(col("doc_id")),
      bit_xor(xxhash64(col("doc_id"), col("text")))).head
    (r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2),
      if (r.isNullAt(3)) 0L else r.getLong(3))
  }

  /** Compute the portable signatures for `docs` and persist them; returns
    * the READ-BACK table (a parquet scan, so consumers never re-derive
    * the signatures from text). */
  def build(docs: DataFrame, path: String, shingleN: Int = 3, k: Int = 16,
            vocabKey: Option[String] = None): DataFrame = {
    Dedup.minhashSignaturesPortable(docs, shingleN, k, vocabKey)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    writeMeta(path, shingleN, k, fingerprint(docs))
    load(docs.sparkSession, path)
  }

  /** Reopen a previously built store (no validation — production callers
    * that own the write path skip the fingerprint scan). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Build-or-reopen with staleness validation: reopen only when the meta
    * sidecar exists, parses, matches (shingleN, k) and the stored
    * fingerprint equals the live source's. Anything else → rebuild. */
  def forCorpus(docs: DataFrame, path: String, shingleN: Int = 3, k: Int = 16,
                vocabKey: Option[String] = None): DataFrame = {
    val fresh = storedMeta(path).exists { case (sn, kk, fp) =>
      sn == shingleN && kk == k && fp == fingerprint(docs)
    }
    if (fresh) load(docs.sparkSession, path)
    else build(docs, path, shingleN, k, vocabKey)
  }

  /** Injective tmp-dir name for a corpus key (same prefix-free escaping
    * as AnnIndex.dirName). */
  private[graft] def dirName(key: String, shingleN: Int, k: Int): String =
    "graft_sig_" + key.flatMap(c =>
      if (c.isLetterOrDigit && c < 0x80) c.toString else f"_${c.toInt}%04x") +
      s"_n${shingleN}k$k"

  private def storedMeta(path: String): Option[(Int, Int, (Long, Long, Long, Long))] =
    scala.util.Try {
      val h = Files.readAllLines(Paths.get(path, MetaFile),
        StandardCharsets.UTF_8).get(0).split(' ')
      (h(0).toInt, h(1).toInt,
        (h(2).toLong, h(3).toLong, h(4).toLong, h(5).toLong))
    }.toOption

  /** Atomic (temp + rename) — the sidecar is the commit marker. */
  private def writeMeta(path: String, shingleN: Int, k: Int,
                        fp: (Long, Long, Long, Long)): Unit = {
    val body = s"$shingleN $k ${fp._1} ${fp._2} ${fp._3} ${fp._4}\n"
    val tmp = Files.createTempFile(Paths.get(path), "_graft_meta", ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path, MetaFile),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
