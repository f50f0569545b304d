package graft

import graft.operators.SimSearch
import graft.sources.AnnIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized ANN index: build-once layout with stored bucket/cell
  * partition columns must return bit-identical results to the direct
  * single-call operators, reopen without retraining, and keep the recall
  * contract of the quantized IVF. */
class AnnIndexSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private val sfEmb = "/root/testdata/sf0.001/embeddings.parquet"
  private lazy val emb = spark.read.parquet(sfEmb)
  private lazy val query = emb.filter(col("vec_id") === 0)
    .select(col("embedding")).head().getSeq[Float](0)
  private lazy val idx = AnnIndex.build(emb,
    s"${sys.props("java.io.tmpdir")}/graft_ann_spec", bits = 4, nCells = 16)

  test("quantized Lloyd training is deterministic") {
    val a = SimSearch.trainIvfCentroidsQuantized(emb, nCells = 16)
    val b = SimSearch.trainIvfCentroidsQuantized(emb, nCells = 16)
    assert(a.length == 16 && a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("index LSH top-k equals the direct recompute-per-query operator") {
    val direct = SimSearch.lshTopK(emb, query, k = 20, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val indexed = idx.lshTopK(query, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(indexed == direct)
  }

  test("index IVF top-k equals the direct quantized operator") {
    val direct = SimSearch.ivfTopKQuantized(emb, query, k = 20,
        nCells = 16, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val indexed = idx.ivfTopK(query, k = 20, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(indexed == direct)
  }

  test("load reopens the index without retraining (same centroids, same rows)") {
    val reopened = AnnIndex.load(spark, idx.path)
    assert(reopened.bits == idx.bits && reopened.nCells == idx.nCells)
    assert(reopened.centroids.zip(idx.centroids)
      .forall { case (a, b) => a.sameElements(b) })
    assert(reopened.ivfTopK(query, 20).collect().map(_.getLong(0)).toSeq ==
      idx.ivfTopK(query, 20).collect().map(_.getLong(0)).toSeq)
  }

  test("append: delta vectors land under the fixed quantizer, no rebuild") {
    val full = emb
    val half1 = full.filter(col("vec_id") % 2 === 0)
    val half2 = full.filter(col("vec_id") % 2 =!= 0)
    val idx2 = AnnIndex.build(half1,
      s"${sys.props("java.io.tmpdir")}/graft_ann_append_spec", bits = 4, nCells = 16)
    AnnIndex.append(idx2, half2)
    // LSH buckets are data-independent → incremental build answers exactly
    // like a query over the full corpus
    val direct = SimSearch.lshTopK(full, query, k = 20, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(idx2.lshTopK(query, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == direct)
    // IVF: the quantizer stays the one trained at build (on half1); the
    // appended rows are assigned with it — equal to the direct operator
    // run over the full corpus with those same centroids
    val ivfDirect = SimSearch.ivfTopKQuantized(full, query, k = 20,
        nProbe = 3, centroidsOpt = Some(idx2.centroids))
      .collect().map(_.getLong(0)).toSeq
    assert(idx2.ivfTopK(query, k = 20, nProbe = 3)
      .collect().map(_.getLong(0)).toSeq == ivfDirect)
  }

  test("directory encoding is injective — distinct keys never share a dir") {
    // naive '_'-sanitization maps these to the same name
    assert(AnnIndex.dirName("a/b", 4, 16) != AnnIndex.dirName("a_b", 4, 16))
    assert(AnnIndex.dirName("a.b", 4, 16) != AnnIndex.dirName("a/b", 4, 16))
    assert(AnnIndex.dirName("a b", 4, 16) != AnnIndex.dirName("a#b", 4, 16))
    // variable-width hex escapes are NOT prefix-free: U+0123 vs U+0012 '3'
    assert(AnnIndex.dirName("ģ", 4, 16) != AnnIndex.dirName("3", 4, 16))
    assert(AnnIndex.dirName("k", 4, 16) == AnnIndex.dirName("k", 4, 16))
  }

  test("forTable detects a regenerated corpus and rebuilds (no stale serve)") {
    val key = "spec#stale#check"
    AnnIndex.clearHandles()
    // first "process": index over HALF the corpus
    val half = emb.filter(col("vec_id") % 2 === 0)
    AnnIndex.forTable(half, spark, key)
    // second "process" (cleared handle cache): same key, regenerated corpus
    AnnIndex.clearHandles()
    val h2 = AnnIndex.forTable(emb, spark, key)
    val direct = SimSearch.lshTopK(emb, query, k = 20, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(h2.lshTopK(query, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == direct,
      "the fingerprint mismatch must trigger a rebuild over the new corpus")
    // and an UNCHANGED corpus reopens without rebuilding: same answers
    AnnIndex.clearHandles()
    val h3 = AnnIndex.forTable(emb, spark, key)
    assert(h3.centroids.zip(h2.centroids).forall { case (a, b) => a.sameElements(b) })
    AnnIndex.clearHandles()
  }

  test("quantized IVF keeps the recall contract on clustered embeddings") {
    val rng = new java.util.Random(11)
    val dim = 64
    val centers = Array.fill(10)(Array.fill(dim)(rng.nextGaussian() * 0.1))
    val rows = (0 until 500).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(v => (v + rng.nextGaussian() * 0.005).toFloat).toSeq)
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val q = centers(0).map(v => (v + rng.nextGaussian() * 0.005).toFloat).toSeq
    // brute force with the SAME ranking family (quantized cosine), so the
    // gate isolates what IVF changes: the probed subset
    val brute = SimSearch.quantizedCosineTopK(clustered, q, 20)
      .collect().map(_.getLong(0)).toSet
    val ivf = SimSearch.ivfTopKQuantized(clustered, q, 20, nCells = 16, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = (ivf & brute).size / 20.0
    assert(recall >= 0.75, s"quantized IVF recall@20 = $recall")
  }
}
