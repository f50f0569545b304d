package graft

import graft.operators.{Dedup, Multimodal, SimSearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup
    (4L, "completely different content entirely here now"),
    (5L, "unrelated words nothing shared with others")
  ).toDF("doc_id", "text")

  test("exact dedup groups duplicates under min doc_id") {
    val g = Dedup.exact(docs).filter(col("n_dups") > 1).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("n_dups") == 2 && g.head.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLshCandidates(docs, shingleN = 3, bands = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup must collide in every band")
    assert(!pairs.contains((4L, 5L)), "unrelated docs must not be candidates")
  }

  test("simhash: identical text → identical hash; near dup within hamming") {
    val sh = Dedup.simhashes(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) <
      java.lang.Long.bitCount(sh(1L) ^ sh(4L)),
      "near dup must be closer in hamming space than unrelated text")
  }

  test("ngram jaccard pairs: integer threshold arithmetic") {
    // docs 1/3: 7 shared of 8∪8 distinct words → jaccard 7/9 ≈ 0.78
    val at70 = Dedup.ngramJaccardPairs(docs, minSharedPct = 70)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at70 == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val at80 = Dedup.ngramJaccardPairs(docs, minSharedPct = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at80 == Set((1L, 2L)), "7/9 < 0.8 must be excluded")
  }

  test("brute-force cosine top-k: self is the best match") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = SimSearch.bruteForceTopK(emb, Seq(1.0f, 0.0f, 0.0f), 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L, 1L, 2L))
  }

  test("quantized dot ranking agrees with cosine ranking on unit-ish vectors") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.7f, 0.7f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val top = SimSearch.quantizedDotTopK(emb, Seq(1.0f, 0.0f), 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L, 1L, 2L))
  }

  test("multimodal plumbing: deterministic stub decode, schema intact") {
    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 5)
    val f1 = feats.find(_.doc_id == "1").get
    val f2 = feats.find(_.doc_id == "2").get
    assert(f1.n_bytes == 43 && f1.width == 64 + 43 % 640)
    assert(f1.feature.toSeq == f2.feature.toSeq, "same bytes → same features")
    assert(f1.feature.length == 8)
  }

  test("rolling hash expression: codegen and interpreted agree, distinct texts differ") {
    val out = docs.select(col("doc_id"),
      graft.functions.RollingHash.rolling_hash(col("text")).as("fp")).collect()
    val m = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(4L))
    // matches the reference implementation run driver-side
    val expected = graft.functions.RollingHashExpr.hash(
      "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"))
    assert(m(1L) == expected)
    // SQL registration path
    graft.functions.RollingHash.register(spark)
    docs.createOrReplaceTempView("rh_docs")
    val viaSql = spark.sql("SELECT rolling_hash(text) AS fp FROM rh_docs WHERE doc_id = 1")
      .head().getLong(0)
    assert(viaSql == expected)
  }
}
