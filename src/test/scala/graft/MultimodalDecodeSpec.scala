package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{HeaderDecoder, MediaRow}
import org.scalatest.funsuite.AnyFunSuite

/** Real PNG/JPEG header decoding against hand-built byte arrays — the
  * decode step inside the batched multimodal contract is no longer a pure
  * stub: width/height come from the actual public container formats
  * (PNG IHDR per RFC 2083; JPEG SOFn per ITU T.81). */
class MultimodalDecodeSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  /** Minimal PNG: signature + an IHDR chunk declaring width × height. */
  private def png(width: Int, height: Int): Array[Byte] = {
    def be32(v: Int) = Array(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
    (Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII").map(_.toInt) ++
      be32(width) ++ be32(height) ++
      Array(8, 6, 0, 0, 0) ++ be32(0)).map(_.toByte)
  }

  /** Minimal JPEG: SOI, an APP0 segment to skip, then a SOF0 frame header
    * carrying height/width. */
  private def jpeg(width: Int, height: Int): Array[Byte] = {
    val app0 = Array(0xFF, 0xE0, 0x00, 0x10) ++ Array.fill(14)(0x4A)
    val sof0 = Array(0xFF, 0xC0, 0x00, 0x11, 8,
      (height >>> 8) & 0xff, height & 0xff,
      (width >>> 8) & 0xff, width & 0xff, 3)
    (Array(0xFF, 0xD8) ++ app0 ++ sof0 ++ Array.fill(9)(0)).map(_.toByte)
  }

  test("PNG IHDR parses to the exact declared dimensions") {
    assert(HeaderDecoder.decodeDims(png(256, 128)) == Some((256, 128)))
    assert(HeaderDecoder.decodeDims(png(1, 1)) == Some((1, 1)))
    assert(HeaderDecoder.decodeDims(png(40000, 30000)) == Some((40000, 30000)))
  }

  test("JPEG SOF0 parses to the exact declared dimensions, skipping APPn") {
    assert(HeaderDecoder.decodeDims(jpeg(320, 120)) == Some((320, 120)))
    assert(HeaderDecoder.decodeDims(jpeg(65535, 1)) == Some((65535, 1)))
  }

  test("non-image payloads fall back to the deterministic fake features") {
    val junk = "not an image at all".getBytes("UTF-8")
    assert(HeaderDecoder.decodeDims(junk).isEmpty)
    val row = MediaRow("d1", "media://d1", junk)
    val real = HeaderDecoder.decodeBatch(Iterator(row)).next()
    val fake = Multimodal.FakeDecoder.decodeBatch(Iterator(row)).next()
    // field-wise compare (case-class equality is reference-based on the
    // Array[Float] feature field)
    assert((real.n_bytes, real.width, real.height, real.n_frames) ==
      ((fake.n_bytes, fake.width, fake.height, fake.n_frames)))
    assert(real.feature.sameElements(fake.feature),
      "unknown formats must keep the stub's determinism")
  }

  test("truncated or desynced streams never throw, they fall back") {
    assert(HeaderDecoder.decodeDims(Array[Byte]()).isEmpty)
    assert(HeaderDecoder.decodeDims(png(9, 9).take(20)).isEmpty)
    assert(HeaderDecoder.decodeDims(Array(0xFF, 0xD8, 0x00, 0x01).map(_.toByte)).isEmpty)
    assert(HeaderDecoder.decodeDims(jpeg(9, 9).take(7)).isEmpty)
  }

  test("the batched Dataset path decodes real headers in place") {
    val rows = Seq(
      MediaRow("p", "media://p", png(640, 480)),
      MediaRow("j", "media://j", jpeg(800, 600)),
      MediaRow("x", "media://x", "plain words".getBytes("UTF-8")))
    val out = Multimodal.extractFeatures(rows.toDS(),
        decoder = HeaderDecoder.decodeBatch)
      .collect().map(f => f.doc_id -> ((f.width, f.height))).toMap
    assert(out("p") == ((640, 480)))
    assert(out("j") == ((800, 600)))
    // the fallback row keeps FakeDecoder's byte-derived pseudo-dimensions
    val n = "plain words".getBytes("UTF-8").length
    assert(out("x") == ((64 + n % 640, 64 + (n * 31) % 480)))
  }

  test("GIF and WebP (VP8/VP8L/VP8X) headers parse to exact dimensions") {
    def gif(w: Int, h: Int, magic: String = "GIF89a"): Array[Byte] =
      magic.getBytes("US-ASCII") ++ Array[Byte](
        (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
        (h & 0xff).toByte, ((h >> 8) & 0xff).toByte)
    assert(HeaderDecoder.decodeDims(gif(320, 200)).contains((320, 200)))
    assert(HeaderDecoder.decodeDims(gif(1, 70000 & 0xffff, "GIF87a"))
      .contains((1, 70000 & 0xffff)))
    assert(HeaderDecoder.decodeDims(gif(0, 10)).isEmpty, "zero dims are corrupt")
    assert(HeaderDecoder.decodeDims("GIF89a".getBytes("US-ASCII")).isEmpty)

    def riff(fourcc: String, payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ Array.fill(4)(0.toByte) ++
        "WEBP".getBytes("US-ASCII") ++ fourcc.getBytes("US-ASCII") ++
        Array.fill(4)(0.toByte) ++ payload
    // VP8 lossy: 3-byte frame tag, sync 9D 01 2A, then 14-bit LE dims
    val vp8 = riff("VP8 ", Array[Byte](0, 0, 0, 0x9D.toByte, 0x01, 0x2A,
      (640 & 0xff).toByte, (640 >> 8).toByte,
      (360 & 0xff).toByte, (360 >> 8).toByte))
    assert(HeaderDecoder.decodeDims(vp8).contains((640, 360)))
    // VP8L lossless: sig 2F, then w-1 (14 bits) | h-1 (14 bits) packed LE
    val bits = (799L & 0x3FFF) | ((599L & 0x3FFF) << 14)
    val vp8l = riff("VP8L", Array[Byte](0x2F,
      (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
      ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte))
    assert(HeaderDecoder.decodeDims(vp8l).contains((800, 600)))
    // VP8X extended: flags + reserved, then 24-bit LE canvas dims minus 1
    val vp8x = riff("VP8X", Array[Byte](0, 0, 0, 0,
      (1023 & 0xff).toByte, ((1023 >> 8) & 0xff).toByte, 0,
      (767 & 0xff).toByte, ((767 >> 8) & 0xff).toByte, 0))
    assert(HeaderDecoder.decodeDims(vp8x).contains((1024, 768)))
    // truncated VP8 sync / unknown chunk → fallback
    assert(HeaderDecoder.decodeDims(vp8.take(25)).isEmpty)
    assert(HeaderDecoder.decodeDims(riff("ALPH", Array.fill(10)(1.toByte))).isEmpty)
  }

  test("corrupt headers with non-positive dims fall back, never propagate") {
    // IHDR declaring 2^31 (negative after .toInt) and a zero-width SOF0
    def be32neg(b: Array[Byte], off: Int): Array[Byte] = {
      b(off) = 0x80.toByte; b(off + 1) = 0; b(off + 2) = 0; b(off + 3) = 0; b
    }
    assert(HeaderDecoder.decodeDims(be32neg(png(9, 9), 16)).isEmpty,
      "a 2^31 PNG width must not decode to a negative Int")
    assert(HeaderDecoder.decodeDims(png(0, 9)).isEmpty, "zero dims are corrupt")
    assert(HeaderDecoder.decodeDims(jpeg(0, 600)).isEmpty)
  }

  test("the catalog binder plants real payloads the honest decoder reads") {
    val docs = Seq(3L -> "three", 7L -> "seven", 5L -> "plain text here")
      .toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
        Multimodal.fromDocumentsWithImages(docs),
        decoder = HeaderDecoder.decodeBatch)
      .collect().map(f => f.doc_id.toLong ->
        ((f.n_bytes, f.width, f.height, f.n_frames))).toMap
    // %10==3 → PNG header: dims derive from the id; n_bytes is the fixed
    // 33-byte header; n_frames = FakeDecoder over those bytes = 1+33%30
    assert(out(3L) == ((33, 4, 22, 4)), s"png row: ${out(3L)}")
    // %10==7 → JPEG SOF0: (1+7, 1+21), 21 bytes, frames 1+21%30
    assert(out(7L) == ((21, 8, 22, 22)), s"jpeg row: ${out(7L)}")
    // other rows keep the UTF-8 payload + fake features
    val n = "plain text here".getBytes("UTF-8").length
    assert(out(5L) == ((n, 64 + n % 640, 64 + (n * 31) % 480, 1 + n % 30)))
  }

  test("WAV headers parse to the exact declared audio parameters") {
    import graft.operators.Multimodal.AudioHeaderDecoder
    // the builder's own output: 44-byte RIFF/WAVE, fmt then data
    assert(AudioHeaderDecoder.decodeParams(Multimodal.wavBytes(44100, 2, 1000))
      .contains((44100, 2, 1000L)))
    assert(AudioHeaderDecoder.decodeParams(Multimodal.wavBytes(8000, 1, 1L))
      .contains((8000, 1, 1L)))
    // a foreign subchunk (LIST) before fmt must be skipped, not fatal
    val w = Multimodal.wavBytes(16000, 1, 500)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array.fill(4)(0x20.toByte)
    val withList = w.take(12) ++ list ++ w.drop(12)
    assert(AudioHeaderDecoder.decodeParams(withList)
      .contains((16000, 1, 500L)))
    // malformed payloads fall back: bad magic, truncation, non-PCM
    assert(AudioHeaderDecoder.decodeParams("RIFXnope".getBytes).isEmpty)
    assert(AudioHeaderDecoder.decodeParams(w.take(20)).isEmpty)
    val nonPcm = w.clone(); nonPcm(20) = 3 // audio format = IEEE float
    assert(AudioHeaderDecoder.decodeParams(nonPcm).isEmpty)
  }

  test("the audio binder plants real WAV payloads the honest decoder reads") {
    val docs = Seq(5L -> "five", 2L -> "plain text here")
      .toDF("doc_id", "text")
    val out = Multimodal.extractAudio(Multimodal.fromDocumentsWithAudio(docs))
      .collect().map(f => f.doc_id.toLong ->
        ((f.n_bytes, f.sample_rate, f.channels, f.n_samples, f.dur_ms))).toMap
    // %10==5 → WAV: rate 8000+4000·(5%8)=28000, ch 1+5%2=2, 1005 samples
    assert(out(5L) == ((44, 28000, 2, 1005L, 1005L * 1000 / 28000)),
      s"wav row: ${out(5L)}")
    // other rows keep UTF-8 payload + deterministic fake parameters
    val n = "plain text here".getBytes("UTF-8").length
    val rate = 8000 + (n * 7) % 40000
    val samples = 256L + (n * 13) % 65536
    assert(out(2L) == ((n, rate, 1 + n % 2, samples, samples * 1000 / rate)))
  }

  test("planted GIF/WebP builders round-trip through the real decoder") {
    assert(HeaderDecoder.decodeDims(Multimodal.gifBytes(640, 480))
      .contains((640, 480)))
    assert(HeaderDecoder.decodeDims(Multimodal.gifBytes(1, 65535))
      .contains((1, 65535)))
    assert(HeaderDecoder.decodeDims(Multimodal.webpBytes(800, 600))
      .contains((800, 600)))
    // 14-bit boundary: VP8L dims max out at 16384
    assert(HeaderDecoder.decodeDims(Multimodal.webpBytes(16384, 1))
      .contains((16384, 1)))
  }
}
