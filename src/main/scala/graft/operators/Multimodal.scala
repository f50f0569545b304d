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

  /** REAL header decode for the ubiquitous public image formats — enough
    * to make width/height honest without media libraries:
    *
    *  - PNG (public spec, RFC 2083 / W3C): 8-byte signature
    *    89 50 4E 47 0D 0A 1A 0A, then chunks; the FIRST chunk must be
    *    IHDR, whose payload starts at byte 16 with width and height as
    *    big-endian uint32.
    *  - JPEG (ITU T.81): starts FF D8 (SOI); markers FF xx follow, each
    *    non-standalone marker carrying a big-endian length. The frame
    *    header SOFn (FF C0-CF except C4/C8/CC) carries height at payload
    *    offset 3-4 and width at 5-6, big-endian uint16.
    *  - GIF (GIF87a/89a spec): 6-byte magic, then the Logical Screen
    *    Descriptor's width and height as little-endian uint16.
    *  - WebP (RIFF container spec): "RIFF" size "WEBP", then the first
    *    chunk decides — "VP8 " lossy (sync 9D 01 2A, 14-bit LE dims),
    *    "VP8L" lossless (sig 2F, two packed 14-bit dims minus one),
    *    "VP8X" extended (24-bit LE canvas dims minus one).
    *
    * Payloads that are none of these fall back to the deterministic
    * FakeDecoder features (the synthetic-catalog oracle path). */
  object HeaderDecoder extends Serializable {
    private val pngSig =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    private def be32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

    private def be16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    private def le24(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16)

    private def ascii(b: Array[Byte], off: Int, len: Int): String =
      new String(b.slice(off, off + len), "US-ASCII")

    private def positive(w: Int, h: Int): Option[(Int, Int)] =
      if (w > 0 && h > 0) Some((w, h)) else None

    /** WebP: dims from whichever VP8/VP8L/VP8X chunk leads the RIFF. */
    private def webpDims(b: Array[Byte]): Option[(Int, Int)] =
      ascii(b, 12, 4) match {
        case "VP8 " if b.length >= 30 &&
            (b(23) & 0xff) == 0x9D && (b(24) & 0xff) == 0x01 &&
            (b(25) & 0xff) == 0x2A =>
          positive(le16(b, 26) & 0x3FFF, le16(b, 28) & 0x3FFF)
        case "VP8L" if b.length >= 25 && (b(20) & 0xff) == 0x2F =>
          val bits = (b(21) & 0xffL) | ((b(22) & 0xffL) << 8) |
            ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 24)
          positive((bits & 0x3FFF).toInt + 1, ((bits >> 14) & 0x3FFF).toInt + 1)
        case "VP8X" if b.length >= 30 =>
          positive(le24(b, 24) + 1, le24(b, 27) + 1)
        case _ => None
      }

    /** (width, height) from a PNG/JPEG/GIF/WebP header; None otherwise.
      * Decoded dimensions must be POSITIVE: a corrupt IHDR can declare
      * dims ≥ 2^31 (negative after .toInt) or zero — both take the
      * deterministic fallback path instead of propagating downstream. */
    def decodeDims(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length >= 24 && b.take(8).sameElements(pngSig) &&
          ascii(b, 12, 4) == "IHDR")
        positive(be32(b, 16).toInt, be32(b, 20).toInt)
      else if (b.length >= 10 &&
          (ascii(b, 0, 6) == "GIF87a" || ascii(b, 0, 6) == "GIF89a"))
        positive(le16(b, 6), le16(b, 8))
      else if (b.length >= 16 && ascii(b, 0, 4) == "RIFF" &&
          ascii(b, 8, 4) == "WEBP")
        webpDims(b)
      else if (b.length >= 4 && (b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xD8) {
        // walk the marker stream to the first SOFn frame header
        var i = 2
        while (i + 3 < b.length) {
          if ((b(i) & 0xff) != 0xFF) return None // desync — not a marker
          val m = b(i + 1) & 0xff
          if (m == 0xFF) i += 1 // fill bytes before a marker are legal
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2 // standalone
          else {
            val len = be16(b, i + 2)
            if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
              if (i + 8 < b.length) {
                val (w, h) = (be16(b, i + 7), be16(b, i + 5))
                return if (w > 0 && h > 0) Some((w, h)) else None
              }
              return None
            }
            if (len < 2) return None
            i += 2 + len
          }
        }
        None
      } else None
    }

    /** Batched decode with the same contract as FakeDecoder: real
      * dimensions when the payload parses as PNG/JPEG, deterministic
      * fake features otherwise. */
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        decodeDims(r.media_bytes) match {
          case Some((w, h)) =>
            val fake = FakeDecoder.decodeBatch(Iterator(r)).next()
            fake.copy(width = w, height = h)
          case None => FakeDecoder.decodeBatch(Iterator(r)).next()
        }
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
  def extractFeatures(media: Dataset[MediaRow], explicitParts: Int = 0,
                      decoder: Iterator[MediaRow] => Iterator[MediaFeatures] =
                        FakeDecoder.decodeBatch)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    val sized = if (explicitParts > 0) media.repartition(explicitParts) else media
    sized.mapPartitions(decoder)
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

  /** Minimal REAL PNG payload: signature + a well-formed IHDR chunk
    * (8-bit truecolor, zero CRC — the header decoder, like most
    * dimension probes, does not validate CRCs). 33 bytes. */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33) // zero-filled; CRC stays 0
    b.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h)
    b.put(8.toByte).put(2.toByte) // bit depth, color type; rest zero
    b.array()
  }

  /** Minimal REAL JPEG payload: SOI + an SOF0 frame header (ITU T.81
    * layout: Lf=17, precision 8, height, width, 3 components). 21 bytes. */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(21) // component bytes stay 0
    b.put(0xFF.toByte).put(0xD8.toByte)      // SOI
    b.put(0xFF.toByte).put(0xC0.toByte)      // SOF0
    b.putShort(17.toShort).put(8.toByte)     // Lf, precision
    b.putShort(h.toShort).putShort(w.toShort)
    b.put(3.toByte)
    b.array()
  }

  /** Minimal REAL GIF payload: logical-screen header — magic + u16 LE
    * width/height. 10 bytes. */
  def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ Array[Byte](
      (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0xff).toByte)

  /** Minimal REAL WebP payload: RIFF/WEBP container + VP8L chunk —
    * signature 0x2F, then (w−1 | (h−1)«14) packed 14-bit LE. 25 bytes. */
  def webpBytes(w: Int, h: Int): Array[Byte] = {
    val v = (w - 1) | ((h - 1) << 14)
    "RIFF".getBytes("US-ASCII") ++ Array.fill(4)(0.toByte) ++
      "WEBP".getBytes("US-ASCII") ++ "VP8L".getBytes("US-ASCII") ++
      Array.fill(4)(0.toByte) ++ Array[Byte](0x2F,
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  }

  // ------------------------------------------------------------- audio

  case class AudioFeatures(doc_id: String, media_ref: String, n_bytes: Int,
                           sample_rate: Int, channels: Int,
                           n_samples: Long, dur_ms: Long)

  /** STUB audio decoder — the FakeDecoder twin for payloads that are not
    * WAV: deterministic pseudo-parameters from the byte length only, so
    * the catalog oracle recomputes them from `octet_length(text)`. */
  object FakeAudioDecoder extends Serializable {
    def decodeOne(r: MediaRow): AudioFeatures = {
      val n = r.media_bytes.length
      val rate = 8000 + math.floorMod(n * 7, 40000)
      val samples = 256L + math.floorMod(n * 13, 65536)
      AudioFeatures(r.doc_id, r.media_ref, n,
        sample_rate = rate, channels = 1 + math.floorMod(n, 2),
        n_samples = samples, dur_ms = samples * 1000L / rate)
    }
  }

  /** REAL WAV header decode (RIFF/WAVE, the public Microsoft/IBM spec):
    * "RIFF" u32le "WAVE", then subchunks `[id:4][size:u32le][payload]`;
    * the `fmt ` subchunk carries audio format (1 = PCM), channel count
    * (u16le), sample rate (u32le) and bits per sample (u16le at offset
    * 14); the `data` subchunk's declared size divided by the block align
    * (channels · bits/8) is the sample count. Like the image probes this
    * trusts DECLARED sizes — a header probe must not require the payload
    * bytes to be present — but malformed structure (bad magic, missing
    * fmt/data, zero rates or dims) falls back to [[FakeAudioDecoder]]. */
  object AudioHeaderDecoder extends Serializable {
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def ascii(b: Array[Byte], off: Int): String =
      new String(b.slice(off, off + 4), "US-ASCII")

    /** (sample_rate, channels, n_samples) from a WAV header; None if the
      * payload is not well-formed RIFF/WAVE PCM. */
    def decodeParams(b: Array[Byte]): Option[(Int, Int, Long)] = {
      if (b.length < 12 || ascii(b, 0) != "RIFF" || ascii(b, 8) != "WAVE")
        return None
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var dataSize = -1L
      while (i + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
        val id = ascii(b, i)
        val size = le32(b, i + 4)
        if (size < 0 || size > Int.MaxValue - 16) return None // corrupt size
        if (id == "fmt " && size >= 16 && i + 24 <= b.length) {
          val audioFormat = le16(b, i + 8)
          if (audioFormat != 1) return None // non-PCM: out of probe scope
          fmt = Some((le16(b, i + 10), le32(b, i + 12).toInt, le16(b, i + 22)))
        } else if (id == "data") dataSize = size
        // subchunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size.toInt + (size.toInt & 1)
      }
      fmt match {
        case Some((ch, rate, bits))
            if ch > 0 && rate > 0 && bits > 0 && bits % 8 == 0 &&
              dataSize >= 0 =>
          Some((rate, ch, dataSize / (ch.toLong * (bits / 8))))
        case _ => None
      }
    }

    /** Batched decode, FakeAudioDecoder contract: real parameters when
      * the payload parses as RIFF/WAVE PCM, deterministic fakes else. */
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[AudioFeatures] =
      rows.map { r =>
        decodeParams(r.media_bytes) match {
          case Some((rate, ch, samples)) =>
            AudioFeatures(r.doc_id, r.media_ref, r.media_bytes.length,
              rate, ch, samples, samples * 1000L / rate)
          case None => FakeAudioDecoder.decodeOne(r)
        }
      }
  }

  /** Minimal REAL WAV payload: RIFF/WAVE + PCM `fmt ` + a `data` chunk
    * whose size is declared but whose sample bytes are elided (header
    * probes trust declared sizes; shipping n_samples · block_align zero
    * bytes in a synthetic corpus would be pure dead weight). 44 bytes. */
  def wavBytes(sampleRate: Int, channels: Int, nSamples: Long): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit PCM
    val b = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                        // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign)            // byte rate
      .putShort(blockAlign.toShort).putShort(16.toShort)
    b.put("data".getBytes("US-ASCII")).putInt((nSamples * blockAlign).toInt)
    b.array()
  }

  /** Bind a (doc_id, text) table into media rows with real WAV payloads
    * planted on doc_id % 10 == 5: sample rate 8000 + 4000·(id mod 8),
    * 1 + id mod 2 channels, 1000 + id mod 9000 samples. Every other row
    * keeps the UTF-8 text payload and takes the FakeAudioDecoder path —
    * the audio twin of [[fromDocumentsWithImages]]. */
  def fromDocumentsWithAudio(docs: DataFrame)
                            (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes =
          if (id % 10 == 5)
            wavBytes((8000 + (id % 8) * 4000).toInt, (1 + id % 2).toInt,
              1000 + id % 9000)
          else if (text == null) Array.empty[Byte]
          else text.getBytes("UTF-8")
        MediaRow(id.toString, s"media://$id", bytes)
      }
  }

  /** Decode stage for audio rows — same zero-shuffle mapPartitions shape
    * as [[extractFeatures]]. */
  def extractAudio(media: Dataset[MediaRow])
                  (implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions(AudioHeaderDecoder.decodeBatch)
  }

  /** Bind a (doc_id, text) table into media rows WITH real image payloads
    * planted deterministically: doc_id % 10 == 3 rows carry a well-formed
    * PNG header (width = 1 + id mod 1024, height = 1 + 7·id mod 1024),
    * % 10 == 7 rows a JPEG SOF0 (1 + id mod 500 / 1 + 3·id mod 500),
    * % 10 == 1 a GIF logical screen (1 + id mod 1000 / 1 + 9·id mod 1000),
    * % 10 == 9 a WebP VP8L (1 + id mod 800 / 1 + 5·id mod 800), and
    * every other row keeps the UTF-8 text payload. This is what makes the
    * HONEST decoder ([[HeaderDecoder]]) driver-verifiable across ALL FOUR
    * public formats: the catalog's multimodal_features entry decodes these
    * headers for real and the oracle recomputes the dims from doc_id. */
  def fromDocumentsWithImages(docs: DataFrame)
                             (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes =
          if (id % 10 == 3)
            pngBytes((1 + id % 1024).toInt, (1 + (id * 7) % 1024).toInt)
          else if (id % 10 == 7)
            jpegBytes((1 + id % 500).toInt, (1 + (id * 3) % 500).toInt)
          else if (id % 10 == 1)
            gifBytes((1 + id % 1000).toInt, (1 + (id * 9) % 1000).toInt)
          else if (id % 10 == 9)
            webpBytes((1 + id % 800).toInt, (1 + (id * 5) % 800).toInt)
          else if (text == null) Array.empty[Byte]
          else text.getBytes("UTF-8")
        MediaRow(id.toString, s"media://$id", bytes)
      }
  }
}
