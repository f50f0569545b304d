package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence PACKING — the step that turns a curated corpus into training
  * sequences: documents are laid out in a deterministic order (doc_id)
  * into a contiguous token stream, and each document is assigned to the
  * fixed-size training bin its first token lands in (chunked packing:
  * deterministic, order-preserving, the layout used when sequences are
  * filled by concatenation with separators).
  */
object Packing {

  /** (doc_id, n_tokens, start_offset, bin) for every document, where
    * start_offset is the EXCLUSIVE prefix sum of token counts in doc_id
    * order and bin = floor(start_offset / seqLen).
    *
    * The textbook formulation is a global running sum —
    * `sum(n) OVER (ORDER BY doc_id)` — which Spark plans as
    * Exchange SinglePartition: the entire corpus serializes through ONE
    * task, the same anti-pattern tokenVocab avoids for ranks. This
    * implementation is the two-pass distributed scan instead:
    * range-partition by the order key and sort within partitions (global
    * order holds for ANY boundary placement, so the result does not
    * depend on the range sampler), first pass reduces each partition to
    * one subtotal (collected: one row per partition), exclusive-scan the
    * subtotals on the driver, broadcast the offsets, second pass emits
    * local running sums. The only driver data is #partitions longs; no
    * stage sees more than its partition. The per-partition imperative
    * scan is the one place the Dataset API genuinely cannot express the
    * computation without the single-partition Window — the documented
    * RDD escape hatch. No cache is pinned: both jobs share the sort's
    * shuffle lineage, so the second pass re-reads its shuffle files
    * (ShuffleMapStage reuse), not the source. */
  def packChunked(docs: DataFrame, seqLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null policy, mirrored by the oracle SQL: a null doc_id has no place
    // in the deterministic order and is dropped; a null text packs as
    // zero tokens (size(split(null)) is null, not -1, under the non-legacy
    // default) — without the coalesce the tuple encoder throws on the
    // first null row
    val sized = docs
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
          .as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
    val rdd = sized.as[(Long, Long)].rdd
    val partSums = rdd.mapPartitionsWithIndex { case (i, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    // #partitions longs: small enough to ride the task closure — a
    // Broadcast would leak one registration per call until GC
    val offsets = partSums.scanLeft(0L)(_ + _)
    rdd.mapPartitionsWithIndex { case (i, it) =>
      var cum = offsets(i)
      it.map { case (id, n) => val start = cum; cum += n; (id, n, start) }
    }.toDF("doc_id", "n_tokens", "start_offset")
      // floor over double is exact below 2^53 tokens — an exabyte-scale
      // stream before it could bias a bin id
      .withColumn("bin",
        floor(col("start_offset").cast("double") / seqLen).cast("long"))
  }

  /** Per-CHUNK packing rows: one row per (doc_id, bin) slice of the
    * contiguous token stream, so every training bin's contents are fully
    * enumerable — a document whose token span [start, start+n) crosses
    * bin boundaries (or is longer than seqLen) emits one row per bin it
    * touches, with the slice's offset inside that bin and its token
    * count. `packChunked` assigns only the FIRST token's bin; a training
    * layout needs the full (doc, bin, offset_in_bin, n_tokens) map to
    * materialize each sequence.
    *
    * Built on packChunked's distributed prefix sum — the chunk expansion
    * is a pure per-row explode over the bins spanned
    * (floor(start/L) .. floor((start+n−1)/L)), integer arithmetic only,
    * so the DuckDB oracle mirrors it with a range() unnest. Zero-token
    * documents occupy no bin and emit no rows (their placement lives in
    * packChunked's per-doc output). */
  def packChunks(docs: DataFrame, seqLen: Int): DataFrame = {
    val L = lit(seqLen.toLong)
    packChunked(docs, seqLen)
      .filter(col("n_tokens") > 0)
      .withColumn("last_bin",
        floor((col("start_offset") + col("n_tokens") - 1).cast("double") / seqLen)
          .cast("long"))
      .select(col("doc_id"), col("start_offset"), col("n_tokens"),
        explode(sequence(col("bin"), col("last_bin"))).as("bin"))
      .select(col("doc_id"), col("bin"),
        (greatest(col("start_offset"), col("bin") * L) - col("bin") * L)
          .as("offset_in_bin"),
        (least(col("start_offset") + col("n_tokens"), (col("bin") + 1) * L) -
          greatest(col("start_offset"), col("bin") * L)).as("n_tokens"))
  }
}
