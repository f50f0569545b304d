package graft

import graft.canon.ConnectedComponents
import graft.core.EquivEdge
import graft.eval.Evalsorel
import org.scalatest.funsuite.AnyFunSuite

class CanonEvalSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  test("connected components: chain, clique, isolated merge to min label") {
    val edges = Seq(
      EquivEdge("b", "a"), EquivEdge("c", "b"), EquivEdge("d", "c"), // chain a-b-c-d
      EquivEdge("x", "y"), EquivEdge("y", "z"), EquivEdge("x", "z"), // clique
      EquivEdge("m", "n"))
    val canon = ConnectedComponents.canonicalize(spark.createDataset(edges))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq("a", "b", "c", "d").forall(canon(_) == "a"))
    assert(Seq("x", "y", "z").forall(canon(_) == "x"))
    assert(canon("m") == "m" && canon("n") == "m")
  }

  test("distributed path converges on a 100-hop chain within the iteration cap") {
    // one-hop min propagation alone needs O(diameter) = 100 rounds and
    // would blow the maxIter=20 budget; pointer jumping makes it O(log n)
    val edges = (1 until 100).map(i => EquivEdge(f"n$i%03d", f"n${i - 1}%03d"))
    val canon = ConnectedComponents.canonicalize(spark.createDataset(edges))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon.size == 100)
    assert(canon.values.forall(_ == "n000"))
  }

  test("connected components: idempotent (canonical of canonical is itself)") {
    val edges = (0 until 30).map(i => EquivEdge(s"n$i", s"n${i / 3 * 3}"))
    val canon = ConnectedComponents.canonicalize(spark.createDataset(edges))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon.values.forall(c => canon(c) == c))
  }

  test("driver union-find fast path agrees with the distributed loop") {
    val edges = Seq(
      EquivEdge("b", "a"), EquivEdge("c", "b"), EquivEdge("d", "c"),
      EquivEdge("x", "y"), EquivEdge("y", "z"), EquivEdge("m", "n"))
    val ds = spark.createDataset(edges)
    val dist = ConnectedComponents.canonicalize(ds)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val fast = ConnectedComponents.canonicalizeAuto(ds)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the fast path may omit root self-maps (identity by coalesce); every
    // mapping it does emit must agree, and all non-identity mappings exist
    assert(fast.forall { case (k, v) => dist(k) == v })
    assert(dist.filter { case (k, v) => k != v }.forall { case (k, v) => fast(k) == v })
  }

  test("driver union-find survives a deep alias chain inserted root-first") {
    // edges in DESCENDING order build a parent chain as deep as the edge
    // count; a recursive find() overflowed the stack here — find must be
    // iterative (walk to root, then compress)
    val n = 100000
    val edges = (n to 1 by -1).map(i => EquivEdge(f"n$i%07d", f"n${i - 1}%07d"))
    val canon = ConnectedComponents.canonicalizeAuto(spark.createDataset(edges))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon.size >= n)
    assert(canon.filter(_._1 != "n0000000").values.forall(_ == "n0000000"))
  }

  test("withCanonical: identity for unmapped ids") {
    val canonMap = Seq(("b", "a")).toDF("node_id", "canonical_id")
    val df = Seq(("d1", "b"), ("d2", "q")).toDF("doc_id", "ent")
    val out = ConnectedComponents.withCanonical(df, "ent", canonMap, "canon")
      .select("doc_id", "canon").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("d1", "a"), ("d2", "q")))
  }

  test("evalsorel: symmetric matching, duplicate dropping, micro P/R") {
    val gold = Seq(
      ("d1", "Complex_formation", "A", "B"),
      ("d1", "Complex_formation", "B", "A"), // duplicate (unordered) — dropped
      ("d1", "Complex_formation", "C", "D"),
      ("d2", "Complex_formation", "A", "B"))
      .toDF("doc_id", "rel_type", "arg1_norm", "arg2_norm")
    val pred = Seq(
      ("d1", "Complex_formation", "B", "A", 0.0, 1.0), // TP (symmetric)
      ("d1", "Complex_formation", "A", "B", 0.0, 1.0), // duplicate pred — dropped
      ("d1", "Complex_formation", "A", "D", 0.0, 1.0), // FP
      ("d2", "Complex_formation", "A", "B", 0.0, 1.0)) // TP
      .toDF("doc_id", "pred", "subj", "obj", "score_neg", "score_pos")
    val r = Evalsorel.evaluate(gold, pred)
    assert(r.tp == 2 && r.fp == 1 && r.fn == 1)
    assert(math.abs(r.precision - 2.0 / 3) < 1e-9)
    assert(math.abs(r.recall - 2.0 / 3) < 1e-9)
  }

  test("evalsorel: per-doc isolation (same pair in another doc is no match)") {
    val gold = Seq(("d1", "Complex_formation", "A", "B"))
      .toDF("doc_id", "rel_type", "arg1_norm", "arg2_norm")
    val pred = Seq(("d2", "Complex_formation", "A", "B", 0.0, 1.0))
      .toDF("doc_id", "pred", "subj", "obj", "score_neg", "score_pos")
    val r = Evalsorel.evaluate(gold, pred)
    assert(r.tp == 0 && r.fp == 1 && r.fn == 1)
  }
}
