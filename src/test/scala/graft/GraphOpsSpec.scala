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
