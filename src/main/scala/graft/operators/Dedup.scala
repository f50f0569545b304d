package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.concurrent.TrieMap

/** Document deduplication operators for large-scale training-data curation.
  * All operate on a (doc_id, text) table and scale by construction:
  *
  *  - exact: hash-groupBy — one shuffle on a 16-byte key, map-side
  *    combinable; at 100 TB the md5 keys are ~10⁻⁴ of input bytes.
  *  - MinHash + LSH: shingle → k minhashes → band buckets → candidate
  *    pairs only JOIN WITHIN BUCKETS, turning the O(n²) all-pairs problem
  *    into a per-bucket micro-join (the standard banding construction,
  *    Leskovec/Rajaraman/Ullman MMDS ch.3). Hot buckets (boilerplate) are
  *    AQE-skew-splittable since the bucket join is a plain equi-join.
  *  - SimHash: 64-bit hyperplane-sign sketch; near-dups collide on rotated
  *    16-bit prefix blocks (Charikar/Manku-Jain-Sarma style), again join-
  *    in-bucket only.
  *  - n-gram Jaccard: exact verification on candidate pairs (or small-sf
  *    corpora) via distinct-shingle semi-structure; integer arithmetic so
  *    the DuckDB oracle is bit-exact.
  *
  * Everything is `functions._` + higher-order array functions — no UDFs,
  * whole-stage-codegen friendly.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct text with its multiplicity
    * and the kept (minimum) doc_id. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))

  /** Word n-gram shingles as a deduplicated array column. Documents
    * shorter than n words fall back to a single whole-text shingle — an
    * empty shingle set would silently drop the doc from every LSH stage
    * (short exact duplicates would never be candidates). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    when(size(words) < n, array(text)).otherwise(
      array_distinct(filter(
        transform(words, (_, i) =>
          when(i <= size(words) - n,
            concat_ws(" ", slice(words, i + lit(1), lit(n))))),
        c => c.isNotNull)))
  }

  /** MinHash signatures as a DataFrame stage: explode the shingle set once
    * and take k seeded mins in ONE aggregation (map-side combinable).
    * An expression-level formulation (k× `array_min(transform(...))` over
    * a shared shingle column) looks cheaper but is not: Catalyst's
    * CollapseProject inlines the shingle construction into every one of
    * the k hash expressions, re-splitting the text k times (verified with
    * .explain — 32 `split` calls for k=16). Explode+agg computes shingles
    * once and scales: the shuffle key is doc_id, partial mins combine
    * map-side, and shingle rows never exceed the text size. */
  /** Spread a byte-small scan before a per-row-heavy pass: a staged corpus
    * arriving as one file (or one parquet row group) scans as ONE task,
    * and the shingle/hash work downstream is row-amplified compute AQE
    * cannot re-balance (measured: the whole minhash family's 2-3s hot
    * task at sf0.1). No-op whenever the input is already at least as
    * parallel as the cluster — at production scale the scan split count
    * dwarfs defaultParallelism and no shuffle is added. */
  private[graft] def spreadSmall(docs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions >= par) docs
    else docs.repartition(par, col("doc_id"))
  }

  def minhashSignatures(docs: DataFrame, shingleN: Int, k: Int): DataFrame = {
    val sh = spreadSmall(docs).select(col("doc_id"),
      explode(shingles(col("text"), shingleN)).as("sh"))
    val mins = (0 until k).map(s => min(xxhash64(lit(s), col("sh"))).as(s"h$s"))
    sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(s => col(s"h$s")): _*).as("sig"))
  }

  /** LSH candidate pairs: signatures banded into `bands` groups of
    * `rowsPerBand`; docs sharing any band bucket become a candidate pair.
    * The join is bucket-equality only — never all-pairs. */
  def minhashLshCandidates(docs: DataFrame, shingleN: Int = 3,
                           bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val sig = minhashSignatures(docs, shingleN, k)
    val banded = sig.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 64-bit SimHash over word features, DataFrame-staged for the same
    * reason as minhashSignatures: explode the distinct words once, hash
    * once, then 64 conditional-sum aggregates (one shuffle on doc_id,
    * partial sums map-side) and an OR-fold of the sign bits. */
  def simhashes(docs: DataFrame): DataFrame = {
    val words = spreadSmall(docs).select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$i"))
    words.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("sh"))
  }

  /** Per-ROW 64-bit SimHash — identical arithmetic to `simhashes` (same
    * xxhash64 bit votes over the distinct-word set) but folded inside one
    * row with higher-order functions instead of an explode+groupBy:
    * stateless, so it runs on a STREAM (aggregations on an unwindowed
    * stream never finalize in append mode; a per-row expression just
    * flows). Hashes are bound once per word via a transform() before the
    * vote fold; the vote struct and the bit combine live in separate
    * projections so the non-cheap aggregate is never duplicated. Parity
    * with the batch operator is spec-asserted.
    *
    * Null-text parity: the batch `simhashes` DROPS wordless docs (explode
    * of a null array emits nothing), but the when/otherwise vote fold
    * would turn a null vote struct into all-zero bits — sh = 0 — letting
    * null-text rows enter downstream bucket state and emit bogus
    * candidate pairs. Null text therefore yields a NULL sh here, and
    * stream consumers filter it (nearDupCandidatesStream does), keeping
    * the streaming candidate set equal to the batch operator's on ALL
    * inputs. */
  def withSimhash(df: DataFrame, textCol: String = "text",
                  out: String = "sh"): DataFrame = {
    val hashes = transform(array_distinct(split(col(textCol), " ")),
      w => xxhash64(w))
    val votes = aggregate(hashes,
      struct((0 until 64).map(i => lit(0L).as(s"b$i")): _*),
      (acc, h) => struct((0 until 64).map(i =>
        (acc.getField(s"b$i") +
          when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)).as(s"b$i")): _*))
    df.withColumn("graft_votes", votes)
      .withColumn(out, when(col(textCol).isNull, lit(null).cast("long"))
        .otherwise((0 until 64).map(i =>
          when(col("graft_votes").getField(s"b$i") > 0, shiftleft(lit(1L), i))
            .otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b))))
      .drop("graft_votes")
  }

  /** SimHash near-dup candidates: equal 16-bit blocks (4 rotations) →
    * Hamming-verify ≤ `maxHamming` via bit_count(xor).
    *
    * Recall contract: 4 blocks guarantee a collision only when the two
    * hashes differ in ≤ 3 bits (pigeonhole). `maxHamming` beyond 3 is
    * capped — promising a recall the blocking cannot deliver would
    * silently miss qualifying pairs. A larger bound needs more blocks
    * (Manku et al.'s rotation scheme), which trades candidate volume for
    * recall and is out of scope here. */
  def simhashCandidates(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val hamming = math.min(maxHamming, 3)
    val sh = simhashes(docs)
    val blocked = sh.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("blk"),
          shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.blk"), col("bb.key"))
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= hamming)
  }

  /** The composition that actually runs at 100 TB: MinHash-LSH candidate
    * generation (sub-quadratic) followed by exact Jaccard verification on
    * the candidates ONLY — the all-pairs `ngramJaccardPairs` below is the
    * small-scale oracle/verification form. */
  def lshVerifiedDups(docs: DataFrame, shingleN: Int = 3,
                      minSharedPct: Int = 60): DataFrame = {
    val cands = minhashLshCandidates(docs, shingleN)
    val words = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("ws"))
    // verification is per-candidate-ROW (array_intersect on the two word
    // sets) — two equi-joins to fetch the sets, no token-level explosion
    cands
      .join(words.select(col("doc_id").as("doc_a"), col("ws").as("wa")), "doc_a")
      .join(words.select(col("doc_id").as("doc_b"), col("ws").as("wb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("wa"), col("wb"))).as("n_common"),
        size(col("wa")).as("n_a"), size(col("wb")).as("n_b"))
      .filter(col("n_common") * (lit(100) + lit(minSharedPct)) >=
        lit(minSharedPct) * (col("n_a") + col("n_b")))
  }

  // -------------- portable (oracle-verifiable) hash family ----------------
  // The xxhash64 operators above are the 100 TB production path: hashing is
  // a pure per-row expression, no vocabulary state. The *Portable variants
  // trade ONE extra distinct+rank (dense token-id assignment over the sorted
  // distinct token set) for cross-engine bit-exactness: every hash is
  // integer LCG arithmetic over those ids, reproducible in any SQL engine,
  // so the driver's DuckDB oracle verifies the candidate sets value-for-
  // value instead of the weaker rows-only check. Same banding/blocking
  // construction, same shuffle shape — only the hash family differs.

  /** Prime modulus shared by every portable LCG hash. */
  val HashP = 1000003L

  /** Per-hash LCG constants: seeded java.util.Random (algorithm specified
    * by the JDK — stable across versions), multipliers drawn from the FULL
    * [1, P) range. A small multiplier (an early version used 37+61s) never
    * wraps P on a small vocabulary, so the "permutation" is monotone in
    * tid — every min-hash picks the same token (degenerate banding) and
    * simhash parity bits go globally constant (measured: 93k candidate
    * pairs of 500 docs, 90× the xxhash operator). Large multipliers wrap
    * every step and behave like the random permutations the construction
    * assumes. */
  private val lcgRng = new java.util.Random(987654321L)
  val HashA: IndexedSeq[Long] =
    IndexedSeq.fill(64)(1L + java.lang.Math.floorMod(lcgRng.nextLong(), HashP - 1))
  val HashB: IndexedSeq[Long] =
    IndexedSeq.fill(64)(java.lang.Math.floorMod(lcgRng.nextLong(), HashP))

  /** The s-th LCG hash of a token id: (A_s·tid + B_s) mod P. P prime and
    * A_s ∈ [1, P) make each a bijection on [0, P) — a valid min-hash
    * permutation over dense ids. tid ≤ vocabulary size, so A·tid ≤ 1e6·|V|
    * stays BIGINT-safe up to trillion-token vocabularies. */
  def lcgHash(s: Int, tid: Column): Column =
    (lit(HashA(s)) * tid + lit(HashB(s))) % lit(HashP)

  /** Exploded (doc_id, sh) shingle rows. */
  def shingleRows(docs: DataFrame, shingleN: Int): DataFrame =
    spreadSmall(docs)
      .select(col("doc_id"), explode(shingles(col("text"), shingleN)).as("sh"))

  /** Dense token ids 1..V by sorted order over the distinct token set —
    * semantically `row_number() OVER (ORDER BY sh)`, which is what the
    * DuckDB oracle runs, but built WITHOUT the single-partition global
    * Window (a 100 TB vocabulary would serialize through one task):
    * range-repartition the distinct set, sort within partitions, and
    * assign global ranks with zipWithIndex (one lightweight count job for
    * the per-partition offsets, then local arithmetic). The ids equal the
    * global sorted rank wherever the range boundaries fall, so the result
    * is deterministic and engine-portable. The rank is the portability
    * price (one range shuffle of the VOCABULARY, not the corpus);
    * production paths hash tokens directly. */
  def tokenVocab(sh: DataFrame): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    sh.select(col("sh")).distinct()
      .repartitionByRange(col("sh"))
      .sortWithinPartitions(col("sh"))
      .as[String]
      .rdd.zipWithIndex()
      .map { case (s, i) => (s, i + 1L) }
      .toDF("sh", "tid")
  }

  /** Session-scoped vocabulary cache. The four portable catalog operators
    * share a (corpus, tokenization)-keyed vocabulary instead of each
    * rebuilding the distinct + range-shuffle + zipWithIndex rank per query
    * call — the rank is a per-CORPUS artifact, exactly like a staged
    * dictionary at 100 TB (compute once, read many). Keyed by SparkSession
    * identity too so a cached plan never leaks into a different (possibly
    * stopped) session. Callers that pass no key — every spec test — keep
    * the uncached single-shot path and identical semantics: the cached
    * DataFrame is bit-identical to a recomputation (tokenVocab is
    * deterministic). */
  private val vocabCache = TrieMap.empty[(String, String), DataFrame]

  /** Guaranteed-unique session cache key: the classic session's UUID.
    * identityHashCode is NOT unique — after a stopped session is GC'd a
    * new session can collide with the stale entry and receive a persisted
    * plan bound to the dead session. */
  private[graft] def sessionKey(s: org.apache.spark.sql.SparkSession): String =
    org.apache.spark.sql.GraftSqlBridge.sessionUUID(s).getOrElse(
      // non-classic impls: app id + identity as a best effort
      s.sparkContext.applicationId + "#" + System.identityHashCode(s))

  def tokenVocabCached(sh: DataFrame, key: Option[String]): DataFrame =
    key match {
      case None => tokenVocab(sh)
      case Some(k) =>
        sweepStoppedEntries()
        graft.core.SessionCleanup.hook(sh.sparkSession)
        vocabCache.getOrElseUpdate(
          (sessionKey(sh.sparkSession), k), {
            val v = tokenVocab(sh).persist(StorageLevel.MEMORY_AND_DISK)
            v.count() // materialize now so every consumer reads the cache
            v
          })
    }

  /** Seed the cache for `key` with an ALREADY-MATERIALIZED vocabulary —
    * the delta-ingest path: a stored vocabulary (SigStore.loadVocab) is
    * primed under the run's key so every portable operator — including
    * the new-batch signature pass — ranks tokens exactly as the stored
    * signatures did. No-op when the key is already cached. */
  def primeVocabCache(key: String, vocab: DataFrame): Unit = {
    sweepStoppedEntries()
    graft.core.SessionCleanup.hook(vocab.sparkSession)
    vocabCache.getOrElseUpdate((sessionKey(vocab.sparkSession), key), {
      val v = vocab.persist(StorageLevel.MEMORY_AND_DISK)
      v.count()
      v
    })
    ()
  }

  def clearVocabCache(): Unit = {
    vocabCache.values.foreach(df =>
      try df.unpersist() catch { case _: Throwable => () })
    vocabCache.clear()
  }

  private[graft] def cachedVocabCount: Int = vocabCache.size

  // UUID keys already prevent stale REUSE (see sessionKey); the shared
  // SessionCleanup layers (application-end listener + this lookup-time
  // sweep) stop entries pinned to dead sessions from accumulating for
  // the JVM lifetime. No unpersist on sweep: a stopped context's blocks
  // are already gone, and the call would throw on the dead session.
  graft.core.SessionCleanup.registerSweep(() => sweepStoppedEntries())

  private[graft] def sweepStoppedEntries(): Unit =
    vocabCache.foreach { case (k, df) =>
      if (df.sparkSession.sparkContext.isStopped) vocabCache.remove(k)
    }

  /** MinHash signatures over LCG-permuted dense token ids (k columns h0..). */
  def minhashSignaturesPortable(docs: DataFrame, shingleN: Int, k: Int,
                                vocabKey: Option[String] = None): DataFrame = {
    val sh = shingleRows(docs, shingleN)
    minhashSignaturesWithVocab(docs, shingleN, k, tokenVocabCached(sh, vocabKey))
  }

  /** Signatures under an EXPLICIT (sh, tid) vocabulary — the store/delta
    * path, where the vocabulary is itself a persisted artifact
    * ([[graft.sources.SigStore]]) and must rank tokens identically across
    * runs. Tokens absent from the vocabulary contribute no hash (inner
    * join), which is what makes stored and fresh signatures comparable. */
  def minhashSignaturesWithVocab(docs: DataFrame, shingleN: Int, k: Int,
                                 vocab: DataFrame): DataFrame = {
    val t = shingleRows(docs, shingleN).join(vocab, "sh")
      .select(col("doc_id"), col("tid"))
    val mins = (0 until k).map(s => min(lcgHash(s, col("tid"))).as(s"h$s"))
    t.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** (doc_id, band, bucket) rows from k-column portable signatures: band
    * bucket is the exact base-1009 fold of its rowsPerBand min-hashes
    * (h < P ≈ 1e6, so four folded values stay ≤ ~1e15 — overflow-free
    * BIGINT in any engine). ONE definition shared by the full and delta
    * candidate joins — a divergence here would silently break the
    * delta == full-recompute guarantee. */
  private def bandedBuckets(sig: DataFrame, bands: Int,
                            rowsPerBand: Int): DataFrame =
    sig.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        val bucket = (0 until rowsPerBand)
          .map(r => col(s"h${b * rowsPerBand + r}"))
          .reduce((acc, h) => acc * lit(1009L) + h)
        struct(lit(b).as("band"), bucket.as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** LSH banding over the portable signatures → candidate pairs. */
  def minhashLshCandidatesPortable(docs: DataFrame, shingleN: Int = 3,
                                   bands: Int = 4, rowsPerBand: Int = 4,
                                   vocabKey: Option[String] = None): DataFrame = {
    val sig = minhashSignaturesPortable(docs, shingleN, bands * rowsPerBand, vocabKey)
    val banded = bandedBuckets(sig, bands, rowsPerBand)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Portable LSH candidates → exact word-set Jaccard verification (the
    * same verify stage as lshVerifiedDups; counts cast to BIGINT so the
    * schema matches the oracle's count(*) outputs). */
  def lshVerifiedDupsPortable(docs: DataFrame, shingleN: Int = 3,
                              minSharedPct: Int = 80,
                              vocabKey: Option[String] = None): DataFrame =
    verifyWordJaccard(
      minhashLshCandidatesPortable(docs, shingleN, vocabKey = vocabKey),
      docs, minSharedPct)

  /** DELTA form of the portable LSH-verified near-dup join: candidate
    * generation pairs ONLY new docs against the whole corpus — the banded
    * self-join (the quadratic stage) has one side semi-joined to `newIds`;
    * old-old pairs are never generated. Pairs are normalized to
    * doc_a < doc_b regardless of which side is new.
    *
    * `oldSigs` kills the delta's remaining LINEAR full-corpus pass: when a
    * persisted signature table ([[graft.sources.SigStore]], written by the
    * old run next to its keep-list) is supplied, signatures are computed
    * for the NEW batch only and the old corpus text is never re-shingled
    * (spec-asserted). Stored rows overlapping `newIds` are dropped so a
    * re-ingested doc always carries its fresh signature. Without a store,
    * the whole corpus is re-signed in one narrow pass. */
  def lshVerifiedDupsPortableDelta(docs: DataFrame, newIds: DataFrame,
                                   shingleN: Int = 3, minSharedPct: Int = 80,
                                   bands: Int = 4, rowsPerBand: Int = 4,
                                   vocabKey: Option[String] = None,
                                   oldSigs: Option[DataFrame] = None): DataFrame = {
    val k = bands * rowsPerBand
    val sig = oldSigs match {
      case Some(stored) =>
        val newDocs = docs.join(newIds.select(col("doc_id")), Seq("doc_id"), "left_semi")
        val newSig = minhashSignaturesPortable(newDocs, shingleN, k, vocabKey)
        stored.select(newSig.columns.map(col): _*)
          .join(newIds.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(newSig)
      case None => minhashSignaturesPortable(docs, shingleN, k, vocabKey)
    }
    val banded = bandedBuckets(sig, bands, rowsPerBand)
    val bandedNew = banded.join(newIds.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val cands = bandedNew.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    verifyWordJaccard(cands, docs, minSharedPct)
  }

  /** Shared verification tail: fetch the two word sets per candidate pair
    * and apply the exact integer Jaccard predicate. */
  private def verifyWordJaccard(cands: DataFrame, docs: DataFrame,
                                minSharedPct: Int): DataFrame = {
    val words = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("ws"))
    cands
      .join(words.select(col("doc_id").as("doc_a"), col("ws").as("wa")), "doc_a")
      .join(words.select(col("doc_id").as("doc_b"), col("ws").as("wb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("wa"), col("wb"))).cast("long").as("n_common"),
        size(col("wa")).cast("long").as("n_a"),
        size(col("wb")).cast("long").as("n_b"))
      .filter(col("n_common") * (lit(100) + lit(minSharedPct)) >=
        lit(minSharedPct) * (col("n_a") + col("n_b")))
  }

  /** Portable 64-bit SimHash: bit i votes +1/−1 by whether the i-th LCG
    * hash of each distinct word's dense id lands in the lower half of
    * [0, P) — a balanced threshold extractor (parity of an LCG is
    * structured; the half-range test is not). The final hash is the
    * additive combine of the positive bits' powers of two (bit 63 is the
    * Long.MinValue literal — the same two's-complement value either way,
    * and engines without a 1<<63 shift can still express it). */
  def simhashesPortable(docs: DataFrame,
                        vocabKey: Option[String] = None): DataFrame = {
    val w = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("sh"))
    val t = w.join(tokenVocabCached(w, vocabKey), "sh")
      .select(col("doc_id"), col("tid"))
    val bitSums = (0 until 64).map(i =>
      sum(when(lcgHash(i, col("tid")) * 2L < lit(HashP), 1L).otherwise(-1L)).as(s"b$i"))
    t.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("sh"))
  }

  /** Equal-16-bit-block candidates + Hamming verify over a simhash column —
    * shared by the xxhash and portable variants. */
  private def simhashBlockCandidates(sh: DataFrame, hamming: Int): DataFrame = {
    val blocked = sh.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("blk"),
          shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.blk"), col("bb.key"))
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= hamming)
  }

  /** Portable SimHash near-dup candidates (same ≤3-bit recall contract as
    * simhashCandidates — the 4-block pigeonhole bound). */
  def simhashCandidatesPortable(docs: DataFrame, maxHamming: Int = 3,
                                vocabKey: Option[String] = None): DataFrame =
    simhashBlockCandidates(simhashesPortable(docs, vocabKey), math.min(maxHamming, 3))

  /** The corpus-level dedup DELIVERABLE: one (doc_id, keep_id) row per
    * document, where keep_id is the minimum doc id of its duplicate
    * CLUSTER — exact-duplicate edges (same text) unioned with
    * LSH-verified near-dup edges, closed transitively by connected
    * components — and the doc's own id when it is unique. This is the
    * table a 100 TB curation run anti-joins its corpus against; pairwise
    * operators alone under-dedup because near-duplication is transitive
    * (a~b, b~c ⟹ one survivor, even when a~c misses the threshold).
    *
    * Ids ride through the string-keyed component engine as %020d-padded
    * strings, so the min-string representative rule equals numeric min
    * for non-negative ids (the DuckDB oracle mirrors with numeric min +
    * a recursive label-propagation CTE). */
  def keepList(docs: DataFrame, minSharedPct: Int = 80,
               vocabKey: Option[String] = None,
               semanticPairs: Option[DataFrame] = None,
               semanticIdMap: Option[DataFrame] = None): DataFrame = {
    val exactEdges = exactDupEdges(docs)
    val nearEdges = lshVerifiedDupsPortable(docs, minSharedPct = minSharedPct,
        vocabKey = vocabKey)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    // optional third edge source: SEMANTIC near-dups from embedding-space
    // cosine pairs (e.g. SimSearch.quantizedCosinePairs output) —
    // text-level LSH misses paraphrase duplicates that share almost no
    // surface n-grams; a modern dedup deliverable unions exact, lexical
    // and semantic edges before closing the clusters. Embedding tables
    // whose ids are not the doc ids pass `semanticIdMap` (vec_id, doc_id)
    // rows: endpoints resolve through two equi-joins (broadcastable —
    // the map is id-pairs only), unmapped vectors contribute no edge, and
    // two vectors of the same doc collapse to a dropped self-edge. The
    // default (no map) keeps the vec_id ≡ doc_id convention.
    val semEdges = semanticPairs.map { p =>
      semanticIdMap match {
        case Some(m) =>
          p.join(m.select(col("vec_id").as("vec_a"), col("doc_id").as("a")), "vec_a")
            .join(m.select(col("vec_id").as("vec_b"), col("doc_id").as("b")), "vec_b")
            .filter(col("a") =!= col("b"))
            .select(col("a"), col("b"))
        case None => p.select(col("vec_a").as("a"), col("vec_b").as("b"))
      }
    }
    closeAndLabel(docs,
      semEdges.foldLeft(exactEdges.unionByName(nearEdges))(_ unionByName _))
  }

  /** Shared keep-list tail: close (a, b) duplicate edges transitively and
    * label every doc with its cluster's min id (its own id when unique). */
  private def closeAndLabel(docs: DataFrame, edges: DataFrame): DataFrame = {
    implicit val spark: org.apache.spark.sql.SparkSession = docs.sparkSession
    import spark.implicits._
    val pad = (c: Column) => format_string("%020d", c)
    val typed = edges
      .select(pad(col("a")).as("src"), pad(col("b")).as("dst"))
      .as[graft.core.EquivEdge]
    val canon = graft.canon.ConnectedComponents.canonicalizeAuto(typed)
      .withColumnRenamed("node_id", "padded")
    docs.select(col("doc_id"))
      .join(canon, pad(col("doc_id")) === col("padded"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id").cast("long"), col("doc_id")).as("keep_id"))
  }

  /** INCREMENTAL keep-list maintenance — the daily-delta path at 100 TB:
    * close a batch of NEW documents against an existing keep-list WITHOUT
    * re-pairing the old corpus against itself. Edge sources:
    *
    *  1. the old keep-list's cluster STARS (doc → keep_id) — they encode
    *     exactly the old components' connectivity;
    *  2. exact-dup edges over the union, kept only where an endpoint is
    *     new (the md5 groupBy is one cheap narrow pass; old-old exact
    *     connectivity is already in the stars);
    *  3. LSH-verified near-dup pairs where the CANDIDATE JOIN itself is
    *     restricted to new-vs-all ([[lshVerifiedDupsPortableDelta]]) —
    *     the quadratic stage, which is the entire point of the delta.
    *
    * Then one transitive closure over stars ∪ delta edges. A new doc that
    * bridges two previously separate old clusters MERGES them (the hard
    * case — spec-asserted), so the result equals a full recompute
    * whenever the old keep-list was computed with the SAME hash family
    * and vocabulary over which the delta edges are generated. With the
    * production xxhash64 family signatures are corpus-independent, so
    * this holds unconditionally across deltas; with the portable LCG
    * family it holds when old and delta runs share one staged vocabulary
    * (the catalog demonstrates this: `dedup_keep_list_delta` splits the
    * corpus 75/25, runs old-then-delta, and must hash-match the SAME
    * DuckDB oracle as the full `dedup_keep_list`).
    *
    * `oldSigs` — the persisted signature table the old run wrote with
    * [[graft.sources.SigStore]] (the dedup analog of AnnIndex) — removes
    * the last full-corpus pass from the delta: old signatures are READ
    * back, never re-derived from text (see
    * [[lshVerifiedDupsPortableDelta]]). Without it they are recomputed in
    * one narrow pass. */
  def keepListDelta(oldKeep: DataFrame, allDocs: DataFrame, newIds: DataFrame,
                    minSharedPct: Int = 80,
                    vocabKey: Option[String] = None,
                    oldSigs: Option[DataFrame] = None): DataFrame = {
    val stars = oldKeep.filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id").as("a"), col("keep_id").as("b"))
    val ids = newIds.select(col("doc_id"))
    val exactNew = {
      val e = exactDupEdges(allDocs)
      e.join(ids.withColumnRenamed("doc_id", "a"), Seq("a"), "left_semi")
        .unionByName(
          e.join(ids.withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
            .select(col("a"), col("b")))
        .dropDuplicates("a", "b")
    }
    val nearNew = lshVerifiedDupsPortableDelta(allDocs, ids,
        minSharedPct = minSharedPct, vocabKey = vocabKey, oldSigs = oldSigs)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    closeAndLabel(allDocs, stars.unionByName(exactNew).unionByName(nearNew))
  }

  /** Exact-duplicate edges (doc → its group's min doc_id): per-group min
    * via groupBy + an equi-join back. NOT min-over-Window.partitionBy(hash):
    * a window partition is one task, so a boilerplate text duplicated 10^8
    * times would serialize (and buffer, in WindowExec) through a single
    * straggler. The groupBy min combines map-side and the membership join
    * is a plain equi-join — AQE-skew-splittable, the same hot-group-safe
    * pattern as ngramJaccardPairsPrefix's representative join. Plan shape
    * (no Window anywhere) is spec-asserted.
    *
    * Null-text rows form NO exact group: md5(null) is null, and the join
    * back on the hash never matches a null key — each null-text doc keeps
    * itself (unless a near-dup/semantic edge links it). This matches SQL
    * grouping-by-join semantics (the DuckDB oracle behaves identically);
    * note it differs from a Window.partitionBy(md5) formulation, which
    * would cluster all null-text docs together. */
  private[graft] def exactDupEdges(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val reps = hashed.groupBy(col("h")).agg(min(col("doc_id")).as("m"))
    hashed.join(reps, "h")
      .filter(col("doc_id") =!= col("m"))
      .select(col("doc_id").as("a"), col("m").as("b"))
  }

  /** LINE-level boilerplate removal (the C4 / RefinedWeb line-dedup rule,
    * public knowledge: Raffel et al. 2020 §2.2 dedup three-sentence spans;
    * Penedo et al. 2023 drop lines duplicated across documents): a line
    * occurring in ≥ `minDocs` DISTINCT documents is boilerplate (nav bars,
    * cookie banners, license headers) and is removed from every document
    * carrying it. Returns one row per doc: total / boilerplate line
    * counts and the cleaned text with original line order preserved.
    *
    * Scale shape: one explode + one groupBy(line) with a map-side-
    * combinable distinct-count, then an equi-join back on the line key
    * (AQE-skew-splittable — the whole point: a boilerplate line IS a hot
    * key) and a per-doc re-aggregation. No window, no driver state; the
    * per-doc sort_array is bounded by document size. */
  def lineDedup(docs: DataFrame, minDocs: Long = 2L): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val boiler = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("line"), lit(1).as("boiler"))
    lines.join(boiler, Seq("line"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("boiler").isNotNull, 1L).otherwise(0L)).as("n_boiler_lines"),
        // collect_list skips nulls, so the when() keeps only clean lines;
        // sort_array on (pos, line) structs restores original order
        concat_ws("\n", transform(
          sort_array(collect_list(
            when(col("boiler").isNull, struct(col("pos"), col("line"))))),
          s => s.getField("line"))).as("clean_text"))
  }

  /** (id, ws) word-array projection shared by the decontamination forms. */
  private[graft] def decontamWords(df: DataFrame, id: String): DataFrame =
    df.select(col("doc_id").as(id), split(col("text"), " ").as("ws"))

  /** Distinct windows of (per-row column) length `len` over `ws` → (id, g). */
  private[graft] def windowsAt(df: DataFrame, id: String, len: Column): DataFrame =
    df.filter(size(col("ws")) >= len)
      .select(col(id), explode(array_distinct(
        transform(sequence(lit(1), size(col("ws")) - len + 1),
          i => concat_ws(" ", slice(col("ws"), i, len))))).as("g"))

  /** Benchmark DECONTAMINATION: flag corpus documents sharing any word
    * n-gram with an evaluation/benchmark set — the leakage check a
    * training-data pipeline runs before every release (n-gram overlap
    * against held-out benchmarks, n = 8 words by convention). One row per
    * contaminated corpus doc: (doc_id, n_eval_docs, n_shared_ngrams).
    *
    * Match rule: docs share an n-gram; docs SHORTER than n words match by
    * whole-doc CONTAINMENT instead — a sub-n eval doc (the common shape
    * for benchmark answers) flags every corpus doc carrying it verbatim
    * as a window, and a sub-n corpus doc is flagged when it appears
    * verbatim inside an eval doc. Matching on n-grams alone would pass
    * short benchmark entries through unflagged. The containment branches
    * shingle at exactly the sub-n lengths PRESENT (≤ n−1 distinct values
    * per side, one tiny broadcast each); gram-string equality implies
    * equal word counts, so no length tagging is needed across branches —
    * but note the branches never match window-vs-window at sub-n lengths
    * (one side is always a whole short doc; an interior bigram shared
    * with a long eval doc is NOT contamination).
    *
    * Scale shape: the eval side is BENCHMARK suites — megabytes against a
    * 100 TB corpus — so every eval-derived join side rides a broadcast
    * (`broadcastEval`, default true) and the corpus side joins map-side
    * with ZERO pre-join shuffle of corpus data (all joins stay broadcast,
    * spec-asserted); the only shuffle is the final groupBy over the
    * (rare) contaminated doc ids. For an eval set too large to broadcast,
    * pass broadcastEval = false and the same plan becomes a shuffled
    * equi-join on the n-gram. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, shingleN: Int = 8,
                    broadcastEval: Boolean = true): DataFrame =
    decontaminateImpl(corpus, evalSet, shingleN, broadcastEval,
      fullGramPred = None)

  /** [[decontaminate]] with a BLOOM-FILTER prefilter on the corpus n-gram
    * stream — the form for an eval side too big to broadcast (the
    * canonical case: decontaminating today's crawl against an entire
    * PRIOR SNAPSHOT's n-grams, gigabytes of grams where benchmark suites
    * are megabytes). `decontaminate(broadcastEval = false)` already
    * handles that shape as a shuffled equi-join — but the shuffle then
    * carries EVERY corpus n-gram (~10× corpus bytes at word-8-grams);
    * against 100 TB that shuffle IS the job. Here the eval grams are
    * first folded into one fixed-size Bloom filter (Spark's own
    * runtime-filter machinery: catalyst `BloomFilterAggregate` /
    * `BloomFilterMightContain` over `xxhash64(gram)` — codegen'd, the
    * exact expressions `InjectRuntimeFilter` plants under AQE), and the
    * corpus gram stream is filtered BEFORE the shuffle: only might-contain
    * survivors (true matches + the fpp·|grams| false positives) are ever
    * shuffled. The exact join downstream then discards the false
    * positives, so the output is IDENTICAL to [[decontaminate]] — the
    * catalog proves it by checking both against the same oracle SQL. A
    * Bloom miss is definitive (no false negatives), which is what makes
    * the prefilter lossless.
    *
    * The filter itself is one driver-side row (`numBits/8` bytes — 4 MiB
    * at the default 2²⁵ bits) rebroadcast as a literal, the same bounded
    * driver hop as a broadcast-join build side. Sub-`shingleN` docs match
    * by containment exactly as in [[decontaminate]]; those branches stay
    * broadcast (they are ≤ n−1 tiny gram sets by construction) and are
    * NOT bloom-filtered. Defaults stay inside Spark's conf caps for
    * runtime bloom filters (4·10⁶ items / 2²⁶ bits); size `numBits` ≈
    * 10–15 bits per distinct eval gram for ~1% fpp at 100 TB. */
  def decontaminateBloom(corpus: DataFrame, evalSet: DataFrame,
                         shingleN: Int = 8,
                         expectedGrams: Long = 2L * 1000 * 1000,
                         numBits: Long = 1L << 25): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val evalGrams = windowsAt(decontamWords(evalSet, "eval_id"),
      "eval_id", lit(shingleN)).select(col("g"))
    val bloomAgg = toCol(new BloomFilterAggregate(
      toExpr(xxhash64(col("g"))), Literal(expectedGrams), Literal(numBits))
      .toAggregateExpression())
    // one bounded driver row: the serialized filter (numBits/8 bytes);
    // null when the eval side has no full-length grams at all — then the
    // full branch is provably empty and the prefilter degenerates to false
    val bf = evalGrams.select(bloomAgg.as("bf")).head.getAs[Array[Byte]](0)
    val pred = Option(bf)
      .map(b => toCol(BloomFilterMightContain(
        Literal(b, BinaryType), toExpr(xxhash64(col("g"))))))
      .getOrElse(lit(false))
    decontaminateImpl(corpus, evalSet, shingleN, broadcastEval = false,
      fullGramPred = Some(pred))
  }

  private def decontaminateImpl(corpus: DataFrame, evalSet: DataFrame,
                                shingleN: Int, broadcastEval: Boolean,
                                fullGramPred: Option[Column]): DataFrame = {
    val bcast = (df: DataFrame) => if (broadcastEval) broadcast(df) else df
    val words = decontamWords _
    val gramsAt = windowsAt _
    val cw = words(corpus, "doc_id")
    val ew = words(evalSet, "eval_id")
    // standard branch: n-grams both sides (bloom-prefiltered when given —
    // the predicate sees the exploded gram column `g`)
    val corpusGrams = gramsAt(cw, "doc_id", lit(shingleN))
    val full = fullGramPred.fold(corpusGrams)(corpusGrams.filter)
      .join(bcast(gramsAt(ew, "eval_id", lit(shingleN))), "g")
    // short-eval containment: each sub-n eval doc is one whole-text gram;
    // the corpus emits windows at the lengths present in that set
    val evShort = ew.filter(size(col("ws")) < shingleN)
      .select(col("eval_id"), concat_ws(" ", col("ws")).as("g"),
        size(col("ws")).as("l"))
    val evLens = evShort.select(col("l")).distinct()
    val shortEval = gramsAt(cw.crossJoin(broadcast(evLens)), "doc_id", col("l"))
      .join(bcast(evShort.select(col("eval_id"), col("g"))), "g")
    // short-corpus containment: symmetric
    val coShort = cw.filter(size(col("ws")) < shingleN)
      .select(col("doc_id"), concat_ws(" ", col("ws")).as("g"))
    val coLens = cw.filter(size(col("ws")) < shingleN)
      .select(size(col("ws")).as("l")).distinct()
    val shortCorp = coShort.join(
      bcast(gramsAt(ew.crossJoin(broadcast(coLens)), "eval_id", col("l"))), "g")
    full.select(col("doc_id"), col("eval_id"), col("g"))
      .unionByName(shortEval.select(col("doc_id"), col("eval_id"), col("g")))
      .unionByName(shortCorp.select(col("doc_id"), col("eval_id"), col("g")))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("eval_id")).as("n_eval_docs"),
        countDistinct(col("g")).as("n_shared_ngrams"))
  }

  /** EXACT word-set Jaccard pairs via PREFIX FILTERING — the published
    * exact similarity self-join (Chaudhuri/Ganti/Kaushik SSJoin ICDE'06;
    * Xiao et al. PPJoin WWW'08): under ANY global token order,
    * J(A,B) ≥ t forces the first (|A| − ⌈t·|A|⌉ + 1) tokens of A to share
    * a token with the same prefix of B (pigeonhole on the required
    * overlap ⌈t·|A|⌉). So the candidate join runs on PREFIX tokens only —
    * rarest-first ordering keeps prefixes maximally selective — and each
    * candidate pair is verified exactly with one array_intersect.
    * Identical output to ngramJaccardPairs (property-tested equal), but
    * the token-level join shrinks from EVERY shared token per pair to the
    * few rarest per doc: on Zipfian real-corpus vocabularies this is the
    * difference between an unrunnable quadratic explode and the exact
    * join production systems ship. The naive form below stays as the
    * spec-level ground truth. */
  def ngramJaccardPairsPrefix(docs: DataFrame, minSharedPct: Int = 60): DataFrame = {
    // SET CANONICALIZATION first — exact for any corpus: Jaccard depends
    // only on the distinct-word SET, so docs with identical sets (exact
    // and shuffled-word duplicates — the bulk of a dedup corpus) group
    // into one representative; the pairwise machinery below runs once per
    // UNIQUE set and qualifying set pairs expand back to doc pairs at the
    // end. Intra-group pairs have J = 1 and always qualify.
    val docSets = docs.select(col("doc_id"),
      array_sort(array_distinct(split(col("text"), " "))).as("ws"))
    val groups = docSets.groupBy(col("ws")).agg(min(col("doc_id")).as("set_id"))
    val uniq = groups.select(col("set_id").as("doc_id"), col("ws"))
    val setPairs = prefixVerifiedPairs(uniq, minSharedPct)
    // group membership WITHOUT materializing per-group arrays: a
    // collect_list of members would put a whole duplicate cluster on ONE
    // row — a boilerplate text duplicated 10^8 times becomes an ~800 MB
    // array before any pairing. Joining each doc back to its
    // representative keeps membership one row per doc; the hot-key join
    // is a plain equi-join, AQE-skew-splittable.
    val members = docSets.join(groups, "ws")
      .select(col("set_id"), col("doc_id").as("m"),
        size(col("ws")).cast("long").as("n"))
    // inter-group expansion: member cross pairs re-ordered by doc id
    // (n_a/n_b follow their doc through the swap; n_common is symmetric)
    val inter = setPairs
      .join(members.select(col("set_id").as("doc_a"), col("m").as("da")), "doc_a")
      .join(members.select(col("set_id").as("doc_b"), col("m").as("db")), "doc_b")
      .select(
        least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"),
        col("n_common"),
        when(col("da") < col("db"), col("n_a")).otherwise(col("n_b")).as("n_a"),
        when(col("da") < col("db"), col("n_b")).otherwise(col("n_a")).as("n_b"))
    // intra pairs (identical sets, J = 1) via a self-join on the
    // representative — the pair count is inherent to the operator's
    // exact-enumeration contract, but no single row ever holds a cluster
    val intra = members.as("a").join(members.as("b"),
        col("a.set_id") === col("b.set_id") && col("a.m") < col("b.m"))
      .select(col("a.m").as("doc_a"), col("b.m").as("doc_b"),
        col("a.n").as("n_common"), col("a.n").as("n_a"), col("b.n").as("n_b"))
    inter.unionByName(intra)
  }

  /** The PPJoin core over (doc_id, ws) rows with UNIQUE word sets:
    * rarest-first prefix candidates + positional filter + exact
    * array_intersect verification. */
  private def prefixVerifiedPairs(words: DataFrame, minSharedPct: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val toks = words.select(col("doc_id"), explode(col("ws")).as("w"))
    // global rarest-first token rank — vocabulary-sized, built with the
    // same scale-safe construction as tokenVocab (no global Window)
    val ranked = toks.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .repartitionByRange(col("df"), col("w"))
      .sortWithinPartitions(col("df"), col("w"))
      .as[(String, Long)]
      .rdd.zipWithIndex()
      .map { case ((w, _), i) => (w, i) }
      .toDF("w", "rank")
    val sets = toks.join(ranked, "w")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("rank"))).as("ranks"))
      .select(col("doc_id"), col("ranks"), size(col("ranks")).as("n"))
      // prefix length |A| − ⌈t·|A|⌉ + 1; integer ceil = floor((pct·n+99)/100),
      // exact in a double for any realistic set size
      .withColumn("plen",
        col("n") - floor((col("n") * minSharedPct + 99) / 100).cast("int") + 1)
    // the prefix self-join and the verification join below amplify their
    // byte-small inputs by orders of magnitude (candidate fan-out /
    // per-pair array_intersect), which AQE's byte-based coalescing cannot
    // see — measured as ONE 29s task at sf0.1. Pin both join inputs to an
    // explicit fixed-count partitioning on the join key (exempt from AQE
    // re-coalescing; defaultParallelism scales with the cluster).
    val par = words.sparkSession.sparkContext.defaultParallelism
    val pref = sets.select(col("doc_id"), col("n"),
      posexplode(slice(col("ranks"), lit(1), col("plen"))).as(Seq("pos", "pt")))
      .repartition(par, col("pt"))
    // PPJoin positional filter, exact: J ≥ t needs overlap ≥
    // α = ⌈t/(1+t)·(n_a+n_b)⌉, and at a prefix match at (1-based) sorted
    // positions (i, j) the overlap is ≤ 1 + min(n_a−i, n_b−j) — the other
    // common tokens all rank later. The MINIMUM common token of a
    // qualifying pair sits in both prefixes and passes this bound (every
    // other common token ranks after it), so filtering match rows on it
    // never drops a qualifying pair — it only prunes late-prefix-only
    // collisions before the distinct.
    val alpha = floor((lit(minSharedPct) * (col("a.n") + col("b.n")) +
      lit(100 + minSharedPct - 1)) / lit(100 + minSharedPct))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.pt") === col("b.pt") && col("a.doc_id") < col("b.doc_id") &&
          // the same exact-preserving length band as the naive form
          lit(minSharedPct) * greatest(col("a.n"), col("b.n")) <=
            lit(100) * least(col("a.n"), col("b.n")) &&
          lit(1) + least(col("a.n") - (col("a.pos") + 1),
            col("b.n") - (col("b.pos") + 1)) >= alpha)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(words.select(col("doc_id").as("doc_a"), col("ws").as("wa")), "doc_a")
      .join(words.select(col("doc_id").as("doc_b"), col("ws").as("wb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("wa"), col("wb"))).cast("long").as("n_common"),
        size(col("wa")).cast("long").as("n_a"),
        size(col("wb")).cast("long").as("n_b"))
      .filter(col("n_common") * (lit(100) + lit(minSharedPct)) >=
        lit(minSharedPct) * (col("n_a") + col("n_b")))
  }

  def ngramJaccardPairs(docs: DataFrame, minSharedPct: Int = 60): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // length-band prefilter, exact-preserving: jaccard >= t forces
    // max(|A|,|B|) <= min(|A|,|B|) * 100/t, so disproportionate pairs are
    // pruned BEFORE the common-word join explodes them
    val sized = toks.join(sizes, "doc_id")
    val common = sized.as("a").join(sized.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
          lit(minSharedPct) * greatest(col("a.n"), col("b.n")) <=
            lit(100) * least(col("a.n"), col("b.n")))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
      // jaccard = common/(n_a+n_b-common) ≥ pct/100, integer arithmetic
      .filter(col("n_common") * (lit(100) + lit(minSharedPct)) >=
        lit(minSharedPct) * (col("n_a") + col("n_b")))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"))
  }

  // --------------------- repeated-passage detection --------------------------

  /** Positioned word k-grams: one (doc_id, pos, g) row per k-token window,
    * pos 0-based. Short docs (< k tokens) contribute nothing — the
    * sequence() bound must be guarded, because Spark's sequence(0, n)
    * DESCENDS for negative n instead of returning empty. */
  private def posGramRows(docs: DataFrame, k: Int,
                          extra: Seq[String] = Nil): DataFrame = {
    val ws = split(col("text"), " ")
    val idxs = when(size(ws) >= lit(k), sequence(lit(0), size(ws) - lit(k)))
      .otherwise(array().cast("array<int>"))
    // spreadSmall: the tokenize+explode is the census' heavy map side and
    // otherwise rides the single-split staged scan as ONE task (the
    // shingleRows precedent; a no-op whenever the scan is already as
    // parallel as the cluster)
    spreadSmall(docs).where(col("text").isNotNull && col("doc_id").isNotNull)
      .select((col("doc_id") +: extra.map(col)) :+
        posexplode(transform(idxs, i => concat_ws(" ", slice(ws, i + lit(1), lit(k)))))
          .as(Seq("pos", "g")): _*)
  }

  /** Exact repeated-PASSAGE detection (the span-level flavor of Lee et
    * al. 2021, "Deduplicating Training Data Makes Language Models Better":
    * duplicated text is usually a shared boilerplate span inside otherwise
    * distinct documents, which document-level dedup cannot see). A k-token
    * window occurring in ≥ minDocs DISTINCT documents marks token range
    * [pos, pos+k) in every document carrying it; overlapping and touching
    * marks merge into maximal intervals per document. Output one row per
    * interval: (doc_id, start_tok, end_tok exclusive, n_grams = number of
    * duplicated windows merged into it). Intra-doc self-repetition is NOT
    * flagged (that is [[TextAnalysis.repetition]]'s signal); the grouping
    * key is distinct-document count, the cross-corpus notion.
    *
    * Scale shape: the window census is distinct (g, doc_id) → count per g —
    * both map-side combinable; the mark join is a plain equi-join on the
    * gram key (hot boilerplate grams are AQE-skew-splittable). The interval
    * merge uses a Window PARTITIONED BY doc_id — bounded by a single
    * document's length, never by corpus size, so unlike a global window it
    * survives any scale-up. The reference engine has no passage-level
    * operator; this is engine-side depth for the curation family. */
  def dupPassages(docs: DataFrame, k: Int = 8, minDocs: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = posGramRows(docs, k)
    // countDistinct — same plan Spark derives for distinct().groupBy.count
    // (partial agg on (g, doc) before the first shuffle, then the deduped
    // g-keyed count), kept in this form to match lineDedup's census
    val dup = grams.groupBy(col("g")).agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= lit(minDocs)).select(col("g"))
    val marked = grams.join(dup, "g").select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevMaxEnd = max(col("pos") + lit(k))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("ni", when(col("pos") > coalesce(prevMaxEnd, lit(-1)), 1).otherwise(0))
      .withColumn("island", sum(col("ni")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("start_tok"),
        (max(col("pos")) + lit(k)).cast("long").as("end_tok"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"), col("n_grams"))
  }

  /** Cluster-size histogram over a keep-list — the one-line reporting
    * rollup a dedup run publishes next to its deliverable ("how much of
    * the corpus is duplicated, in clusters of what size"): (cluster_size,
    * n_clusters) from two map-side-combinable count-by-key aggregations.
    * cluster_size 1 counts the unduplicated docs. */
  def clusterSizeHistogram(keepList: DataFrame): DataFrame =
    keepList.groupBy(col("keep_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  /** Strip flagged token ranges from their documents — the removal half
    * of the Lee et al. passage-dedup pair ([[dupPassages]] detects, this
    * rewrites). `intervals` is (doc_id, start_tok, end_tok exclusive) with
    * DISJOINT ranges per doc (dupPassages merges overlaps — arbitrary
    * callers must too, or tokens under two ranges duplicate through the
    * join). Output one row per doc with non-null id and text: the
    * surviving tokens rejoined in order (canonical single-space form — the
    * token-stream view a packing stage consumes anyway) plus the removed-
    * token count; a fully-duplicated doc comes back as the empty string,
    * which is the honest answer, not a dropped row.
    *
    * Scale shape: tokens join intervals on the DOC key (equi-join with a
    * range residual — never a broadcast-range explosion), then one
    * groupBy(doc) whose collect_list is bounded by a single document's
    * length. Same rebuild idiom as [[lineDedup]]: collect_list skips the
    * when()-nulled removed tokens, sort_array on (pos, w) restores order. */
  def removePassages(docs: DataFrame, intervals: DataFrame): DataFrame = {
    val iv = intervals.select(col("doc_id").as("i_doc"),
      col("start_tok"), col("end_tok"))
    val toks = docs.where(col("text").isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val marked = toks.join(iv,
      toks("doc_id") === iv("i_doc") &&
        col("pos") >= col("start_tok") && col("pos") < col("end_tok"), "left")
    marked.groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(sort_array(collect_list(
          when(col("start_tok").isNull, struct(col("pos"), col("w"))))),
          s => s.getField("w"))).as("clean_text"),
        sum(when(col("start_tok").isNotNull, 1L).otherwise(0L))
          .as("n_removed_tokens"))
  }

  /** Cross-source n-gram overlap census: for every pair of sources, how
    * many distinct k-token windows they share, alongside each side's own
    * distinct-window count — the contamination/provenance matrix a corpus
    * audit publishes (containment = shared/min, Jaccard = shared/(a+b−s)
    * are one division away, left to the consumer to keep the output
    * integer-exact). Null-source docs are excluded: the pair key orders
    * sources with `<`, which is undefined for null provenance.
    *
    * Scale shape: distinct (source, g) — map-side combinable — then an
    * equi-join on the gram key whose fan-out is bounded by the number of
    * SOURCES squared, not documents; per-source totals are a count-by-key.
    * A gram shared by every one of S sources yields S·(S−1)/2 pair rows,
    * independent of corpus size. */
  def crossSourceOverlap(docs: DataFrame, k: Int = 8): DataFrame = {
    val sg = posGramRows(docs.where(col("source").isNotNull), k, Seq("source"))
    val distinctSg = sg.select(col("source"), col("g")).distinct()
    val totals = distinctSg.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = distinctSg.as("a").join(distinctSg.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
    shared
      .join(totals.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n", "grams_a"), "source_a")
      .join(totals.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n", "grams_b"), "source_b")
      .select(col("source_a"), col("source_b"), col("shared_grams"),
        col("grams_a"), col("grams_b"))
  }
}
