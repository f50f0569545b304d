package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The real decode step (image/audio codecs) is STUBBED — the container
  * ships no media libraries — behind `FakeDecoder`, a clearly-marked
  * deterministic stand-in that derives pseudo-features from the bytes.
  * Everything AROUND the stub is real and load-bearing at scale:
  *  - the schema contract (binary payload + struct metadata);
  *  - batched per-partition processing (the Scala analog of `mapInPandas`:
  *    an Iterator→Iterator `mapPartitions` that a vectorized decoder slots
  *    into without changing the plan);
  *  - partition sizing: media rows are fat, so the operator repartitions by
  *    byte budget before decode, not row count.
  */
object Multimodal {

  case class MediaRow(doc_id: String, media_ref: String, media_bytes: Array[Byte])
  case class MediaFeatures(doc_id: String, media_ref: String,
                           n_bytes: Int, width: Int, height: Int,
                           n_frames: Int, feature: Array[Float])

  /** STUB decoder — deterministic fake. A real implementation would decode
    * the codec here; the signature (batch iterator in/out) is the real
    * contract a vectorized decoder must satisfy. */
  object FakeDecoder extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val n = r.media_bytes.length
        // deterministic pseudo-features from byte content (NOT a real decode)
        var h = 1469598103934665603L
        r.media_bytes.foreach { b => h = (h ^ (b & 0xffL)) * 1099511628211L }
        val feat = Array.tabulate(8)(i => (((h >>> (i * 8)) & 0xff).toFloat) / 255f)
        MediaFeatures(r.doc_id, r.media_ref, n,
          width = 64 + math.floorMod(n, 640),
          height = 64 + math.floorMod(n * 31, 480),
          n_frames = 1 + math.floorMod(n, 30), feat)
      }
  }

  /** Decode/feature-extract stage: batched per-partition decode IN PLACE —
    * zero shuffle of media bytes. Partition byte-sizing belongs to the
    * SCAN, not this operator: file sources already split by
    * `spark.sql.files.maxPartitionBytes`, so a table whose rows are
    * 100 MB videos arrives in byte-bounded splits without moving a byte.
    * (An earlier version sized partitions itself — a driver count job plus
    * a full shuffle of ALL payload bytes; at 100 TB of media that shuffle
    * IS the job.) For a non-file upstream with pathological partitioning,
    * `explicitParts > 0` opts into a one-off repartition. */
  def extractFeatures(media: Dataset[MediaRow], explicitParts: Int = 0)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    val sized = if (explicitParts > 0) media.repartition(explicitParts) else media
    sized.mapPartitions(FakeDecoder.decodeBatch _)
  }

  /** Bind a (doc_id, text) table into media rows for plumbing tests — the
    * bytes are the UTF-8 text (stand-in payload, same schema/flow). */
  def fromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("string").as("doc_id"),
        concat(lit("media://"), col("doc_id")).as("media_ref"),
        col("text").cast("binary").as("media_bytes"))
      .as[MediaRow]
  }
}
