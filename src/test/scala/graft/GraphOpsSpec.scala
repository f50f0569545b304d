package graft

import graft.graph.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  /** Scala reference of the SAME integer recurrence GraphOps.pageRank
    * runs — plain maps, no Spark: symmetrize, od, r0 = scale div N, then
    * r'(v) = base + d·Σ(r(u) div od(u)) div 1e6 over in-neighbors. */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
                          d: Long = 850000L,
                          scale: Long = 1000000000000L): Map[String, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val od = adj.map { case (k, v) => k -> v.length.toLong }
    val n = adj.size.toLong
    val r0 = scale / n
    val base = r0 * (1000000L - d) / 1000000L
    var r = adj.keys.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val contrib = sym.groupBy(_._2).map { case (v, ins) =>
        v -> ins.map { case (u, _) => r(u) / od(u) }.sum
      }
      r = contrib.map { case (v, s) => v -> (base + d * s / 1000000L) }
    }
    r
  }

  private def runPageRank(edges: Seq[(String, String)], iters: Int)
      : Map[String, Long] = {
    val df = edges.toDF("src", "dst").repartition(4)
    GraphOps.pageRank(df, iterations = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("pageRank matches the integer reference on a star-plus-path graph") {
    // hub with 3 leaves, one leaf extending into a 2-node tail; the
    // degree spread exercises every od value the recurrence divides by
    val edges = Seq(("hub", "a"), ("hub", "b"), ("hub", "c"),
      ("c", "d"), ("d", "e"))
    val got = runPageRank(edges, iters = 5)
    val want = refPageRank(edges, iters = 5)
    assert(got == want)
    assert(got("hub") > got("a"), "the hub must outrank a degree-1 leaf")
    // truncated mass only ever shrinks the total below the scale
    assert(got.values.sum <= 1000000000000L && got.values.forall(_ > 0))
  }

  test("pageRank is deterministic across runs and edge orderings") {
    val edges = Seq(("x", "y"), ("y", "z"), ("z", "x"), ("z", "w"))
    val a = runPageRank(edges, iters = 5)
    val b = runPageRank(scala.util.Random.shuffle(edges), iters = 5)
    assert(a == b)
    // a 3-cycle plus one pendant: the symmetric cycle nodes x, y tie
    assert(a("x") == a("y"))
  }

  test("pageRank iterations=0 returns the uniform init; directed dup edges collapse") {
    // (a,b) and (b,a) in the input must symmetrize to ONE undirected edge
    val got = runPageRank(Seq(("a", "b"), ("b", "a")), iters = 0)
    assert(got == Map("a" -> 500000000000L, "b" -> 500000000000L))
  }

  /** Naive set-based triangle reference: count, per node, the unordered
    * neighbor pairs that are themselves adjacent — halved for the double
    * count. Dumb on purpose; the operator's degree-ordered enumeration
    * must agree exactly. */
  private def refTriangles(edges: Seq[(String, String)]): Map[String, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    adj.map { case (n, nbs) =>
      val pairs = nbs.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      n -> pairs.toLong
    }
  }

  private def runTriangles(edges: Seq[(String, String)]): Map[String, Long] = {
    val df = edges.toDF("src", "dst").repartition(4)
    GraphOps.triangleCounts(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("triangleCounts: K4 plus a pendant — 3 per clique node, 0 for the pendant") {
    val k4 = for {
      s <- Seq("a", "b", "c", "d"); t <- Seq("a", "b", "c", "d") if s < t
    } yield (s, t)
    val got = runTriangles(k4 :+ ("d", "e"))
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L, "e" -> 0L))
  }

  test("triangleCounts: triangle-free path graph is all zeros") {
    val got = runTriangles(Seq(("a", "b"), ("b", "c"), ("c", "d")))
    assert(got == Map("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 0L))
  }

  test("triangleCounts: degree-ordered enumeration equals the naive reference " +
    "on a seeded random graph with duplicate and reversed input edges") {
    val rnd = new scala.util.Random(20260817L)
    val nodes = (0 until 18).map(i => f"n$i%02d")
    val base = for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if rnd.nextDouble() < 0.25
    } yield (nodes(i), nodes(j))
    // adversarial input shape: every edge also reversed, some duplicated —
    // symmetrize must collapse them before orientation
    val edges = base ++ base.map(_.swap) ++ base.take(5)
    assert(runTriangles(edges) == refTriangles(edges))
  }

  test("neighborJaccard: hand-computed star-plus-chord graph, with and without threshold") {
    // a-(b,c,d) star plus chord b-c:
    //   N(a)={b,c,d} N(b)={a,c} N(c)={a,b} N(d)={a}
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"))
    val df = edges.toDF("src", "dst").repartition(3)
    def asMap(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val all = asMap(GraphOps.neighborJaccard(df))
    assert(all == Map(
      ("a", "b") -> ((1L, 4L, 250L)), // share {c}; union {a,b,c,d}
      ("a", "c") -> ((1L, 4L, 250L)),
      ("b", "c") -> ((1L, 3L, 333L)), // share {a}; union {a,b,c}
      ("b", "d") -> ((1L, 2L, 500L)),
      ("c", "d") -> ((1L, 2L, 500L))))
    // threshold keeps only J >= 0.4; (a,d) shares no neighbor and must
    // never be materialized at any threshold
    val cut = asMap(GraphOps.neighborJaccard(df, minPermille = 400))
    assert(cut.keySet == Set(("b", "d"), ("c", "d")))
  }

  test("nodeDegrees: distinct-neighbor degree and doc support from the rollup") {
    val rollup = Seq(
      ("a", "p1", "b", 3L), ("a", "p2", "b", 2L), // multi-pred: same pair
      ("a", "p1", "c", 1L)
    ).toDF("subj", "pred", "obj", "n_docs").repartition(3)
    val got = GraphOps.nodeDegrees(rollup).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "a" -> ((2L, 6L)), // neighbors {b, c}; support 3+2+1
      "b" -> ((1L, 5L)),
      "c" -> ((1L, 1L))))
  }
}
