package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  def minhashSignatures(docs: DataFrame, shingleN: Int, k: Int): DataFrame = {
    val sh = docs.select(col("doc_id"),
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
    val words = docs.select(col("doc_id"),
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

  /** Exact word-set Jaccard pairs via distinct-token explode + self-join —
    * integer-only outputs (n_common, n_a, n_b) so jaccard ≥ t is the
    * integer predicate (1+t)·common ≥ t·(n_a+n_b) with rational t.
    * At scale this runs on LSH candidates, not all pairs; the standalone
    * form below blocks on a cheap length band to bound the join. */
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
}
