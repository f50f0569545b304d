package graft

import graft.core._
import graft.eval.Evalsorel
import graft.operators.{SimSearch, Skew}
import graft.score.LexiconScorer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Coverage2Spec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  test("evalsorel equiv-representative resolution before matching") {
    // gold says (T1, T5); prediction found the equivalent (T2, T5) — the
    // doc's Equiv line T1~T2 must make them match via representative T1
    val gold = Seq(("d1", "Complex_formation", "T1", "T5"))
      .toDF("doc_id", "rel_type", "arg1_norm", "arg2_norm")
    val pred = Seq(("d1", "Complex_formation", "T2", "T5"))
      .toDF("doc_id", "pred", "subj", "obj")
    val equivs = Seq(("d1", "T1", "T1"), ("d1", "T2", "T1"))
      .toDF("doc_id", "member", "representative")
    val g = Evalsorel.resolveWithEquivs(gold, equivs, Seq("arg1_norm", "arg2_norm"))
    val p = Evalsorel.resolveWithEquivs(pred, equivs, Seq("subj", "obj"))
    val r = Evalsorel.evaluate(g, p)
    assert(r.tp == 1 && r.fp == 0 && r.fn == 0)
    // without resolution they would not match
    val r0 = Evalsorel.evaluate(gold, pred)
    assert(r0.tp == 0 && r0.fp == 1 && r0.fn == 1)
  }

  test("IVF ANN: probing finds the exact top hit; touches only probed cells") {
    val emb = Queries.table(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val ivf = SimSearch.ivfTopK(emb, q, k = 5, nCells = 8, nProbe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf.head == 0L, "self must be the IVF top hit")
    val exact = SimSearch.bruteForceTopK(emb, q, 5).collect().map(_.getLong(0)).toSeq
    assert(ivf.toSet.intersect(exact.toSet).size >= 2,
      s"IVF recall too low: ivf=$ivf exact=$exact")
  }

  test("salted join: output equals the plain join on a hot-keyed input") {
    val hot = (0 until 2000).map(i => (if (i % 10 == 0) "HOT" else s"k$i", i))
      .toDF("key", "payload")
    val dim = Seq(("HOT", "hot_dim"), ("k7", "dim7")).toDF("key", "attr")
    val plain = hot.join(dim, "key").select("key", "payload", "attr")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(hot, dim, "key", salts = 8)
      .select("key", "payload", "attr")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("salted aggregation: two-phase equals single-phase") {
    val df = (0 until 1000).map(i => (if (i % 3 == 0) "HOT" else s"k${i % 50}", 1L))
      .toDF("key", "v")
    val plain = df.groupBy("key").agg(sum("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedAgg(df, "key", 8,
        partial = Seq(sum("v").as("pn")), finalAgg = Seq(sum("pn").as("n")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("pipeline metrics table covers every stage") {
    val p = CorpusGen.Params(nDocs = 40)
    val gen = CorpusGen.generate(spark, p)
    val out = KgPipeline.run(CorpusGen.docs(gen), CorpusGen.dictionary(p),
      spark.createDataset(CorpusGen.equivEdges(p)), LexiconScorer.default)
    val m = KgPipeline.metrics(out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set("scored_pairs", "positive_triples", "triggers",
      "unfitted_pairs", "nodes", "quarantined_docs"))
    assert(m("scored_pairs") > 0 && m("positive_triples") > 0)
    assert(m("quarantined_docs") == 0)
    assert(m("triggers") >= m("positive_triples"), "every positive has >=1 trigger (ties may add more)")
  }
}
