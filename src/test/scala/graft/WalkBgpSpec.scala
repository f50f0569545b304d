package graft

import graft.graph.{BgpMatcher, GraphOps}
import graft.graph.BgpMatcher.{C, TriplePattern, V}
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Random-walk corpus + BGP pattern matching — the two consumer-side
  * surfaces added in round 5 on top of the graph family. */
class WalkBgpSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- walks

  /** Plain-Scala reference of the SAME LCG argmin recurrence
    * GraphOps.randomWalks runs — no Spark. */
  private def refWalks(edges: Seq[(Long, Long)], length: Int, wpn: Int,
                       seed: Long): Set[(Long, Int, Int, Long)] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val rows = for {
      start <- adj.keys.toSeq
      w <- 0 until wpn
    } yield {
      val P = 2147483647L
      val mult = (2654435761L +
        java.lang.Math.floorMod(seed, 65536L) * 32452843L) % P
      var cur = start
      (start, w, 0, start) +: (1 to length).map { t =>
        cur = adj(cur).minBy(n => (
          ((start % P) * 1103515245L % P + w * 12345L + t * 97003L +
            (n % P) * mult % P) % P, n))
        (start, w, t, cur)
      }
    }
    rows.flatten.toSet
  }

  private def runWalks(edges: Seq[(Long, Long)], length: Int, wpn: Int,
                       seed: Long): Set[(Long, Int, Int, Long)] =
    GraphOps.randomWalks(edges.toDF("src", "dst").repartition(4),
        length, wpn, seed)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet

  test("randomWalks on a single edge is the forced alternating walk") {
    // 1-2 only: every step has exactly one neighbor, so the LCG never
    // gets a choice — the walk must alternate 1,2,1,2,...
    val got = runWalks(Seq((1L, 2L)), length = 3, wpn = 1, seed = 7L)
    val want = Set(
      (1L, 0, 0, 1L), (1L, 0, 1, 2L), (1L, 0, 2, 1L), (1L, 0, 3, 2L),
      (2L, 0, 0, 2L), (2L, 0, 1, 1L), (2L, 0, 2, 2L), (2L, 0, 3, 1L))
    assert(got == want)
  }

  test("randomWalks matches the plain-Scala LCG reference exactly") {
    // triangle + tail + hub: nodes with degree 1, 2 and 4, so the argmin
    // faces real choices and the tie/hash order is exercised
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (1L, 6L), (1L, 7L))
    assert(runWalks(edges, 4, 2, 7L) == refWalks(edges, 4, 2, 7L))
    // a different salt must produce a different corpus on this graph
    assert(runWalks(edges, 4, 2, 7L) != runWalks(edges, 4, 2, 99L))
  }

  test("randomWalks invariants: row count, step validity, edge validity") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val df = GraphOps.randomWalks(edges.toDF("src", "dst"), 3, 2, 7L)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rows.length == 4 * 2 * 4) // |V| * walksPerNode * (length+1)
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    rows.groupBy(r => (r._1, r._2)).values.foreach { walk =>
      val path = walk.sortBy(_._3).map(_._4)
      assert(path.head == walk.head._1, "step 0 is the start node")
      path.sliding(2).foreach { case Array(a, b) =>
        assert(sym.contains((a, b)), s"walk hop $a->$b is not an edge")
      }
    }
  }

  test("walkPairs counts symmetric within-window pairs exactly") {
    // one hand-built walk: 10,20,30,20 — window 2 pairs enumerated by hand
    val walks = Seq(
      (1L, 0, 0, 10L), (1L, 0, 1, 20L), (1L, 0, 2, 30L), (1L, 0, 3, 20L))
      .toDF("start", "walk", "step", "node")
    val got = GraphOps.walkPairs(walks, window = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // ordered within-window step pairs: (0,1)(0,2)(1,2)(1,3)(2,3) + flips
    val want = Map(
      (10L, 20L) -> 1L, (20L, 10L) -> 1L, // steps (0,1)
      (10L, 30L) -> 1L, (30L, 10L) -> 1L, // steps (0,2)
      (20L, 30L) -> 2L, (30L, 20L) -> 2L, // steps (1,2) and (2,3)
      (20L, 20L) -> 2L)                   // steps (1,3) both directions
    assert(got == want)
  }

  // ------------------------------------------------------ biased walks

  /** Plain-Scala reference of the node2vec-biased recurrence. */
  private def refBiased(edges: Seq[(Long, Long)], length: Int, wpn: Int,
                        ret: Long, in: Long, out: Long, seed: Long)
      : Set[(Long, Int, Int, Long)] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val adjSet = sym.toSet
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val P = 2147483647L
    val mult = (2654435761L +
      java.lang.Math.floorMod(seed, 65536L) * 32452843L) % P
    val rows = for {
      start <- adj.keys.toSeq
      wk <- 0 until wpn
    } yield {
      var cur = start
      var prev = -1L // sentinel: no previous node
      (start, wk, 0, start) +: (1 to length).map { t =>
        val picked = adj(cur).minBy { n =>
          val h = ((start % P) * 1103515245L % P + wk * 12345L +
            t * 97003L + (n % P) * mult % P) % P
          val w =
            if (prev == -1L) 1000L
            else if (n == prev) ret
            else if (adjSet.contains((prev, n))) in
            else out
          (h / w, n)
        }
        prev = cur; cur = picked
        (start, wk, t, cur)
      }
    }
    rows.flatten.toSet
  }

  private def runBiased(edges: Seq[(Long, Long)], length: Int, wpn: Int,
                        ret: Long, in: Long, out: Long, seed: Long)
      : Set[(Long, Int, Int, Long)] =
    GraphOps.biasedWalks(edges.toDF("src", "dst").repartition(4),
        length, wpn, ret, in, out, seed)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet

  test("biasedWalks matches the plain-Scala node2vec reference exactly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (1L, 6L), (1L, 7L))
    val got = runBiased(edges, 4, 2, 100L, 1000L, 1500L, 7L)
    assert(got == refBiased(edges, 4, 2, 100L, 1000L, 1500L, 7L))
  }

  test("biasedWalks bias semantics: huge return weight forces oscillation") {
    // triangle: every node has 2 neighbors, so step 2 always has the
    // choice between returning and advancing
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val back = runBiased(tri, 4, 1, 1000000000L, 1000L, 1000L, 7L)
    // with ret >> others, every step >= 2 returns to the step-2-ago node
    back.groupBy(r => (r._1, r._2)).values.foreach { wk =>
      val path = wk.toSeq.sortBy(_._3).map(_._4)
      (2 until path.length).foreach { i =>
        assert(path(i) == path(i - 2), s"expected oscillation in $path")
      }
    }
    // with ret = 1 (vanishing), a triangle walk NEVER returns immediately
    val fwd = runBiased(tri, 4, 1, 1L, 1000L, 1000L, 7L)
    fwd.groupBy(r => (r._1, r._2)).values.foreach { wk =>
      val path = wk.toSeq.sortBy(_._3).map(_._4)
      (2 until path.length).foreach { i =>
        assert(path(i) != path(i - 2), s"unexpected return in $path")
      }
    }
  }

  // ------------------------------------------------------ type inference

  test("kgInferredTypes: direct type plus every supertype with hops") {
    val docs = Seq((1L, "customer vector filter"))
      .toDF("doc_id", "text")
    val got = graft.Queries.kgInferredTypesOf(
        graft.Queries.kgTypedTriplesOf(docs))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(
      ("customer", "biz", 0), ("customer", "asset", 1),
      ("customer", "resource", 2),
      ("vector", "data", 0), ("vector", "asset", 1),
      ("vector", "resource", 2)))
  }

  // --------------------------------------------------------------- BGP

  private val kgEdges = Seq(
    // x filter m, m group y, x scan y -- one closed instance (a, b, c)
    ("a", "filter", "b"), ("b", "group", "c"), ("a", "scan", "c"),
    // an open path (a, b, d): no closing scan edge
    ("b", "group", "d"),
    // noise predicates and a self-loop
    ("a", "sort", "a"), ("d", "merge", "e"))

  private def edgesDf = kgEdges.toDF("subj", "pred", "obj")

  test("BGP closed-path pattern finds exactly the closed instance") {
    val pats = Seq(
      TriplePattern(V("x"), C("filter"), V("m")),
      TriplePattern(V("m"), C("group"), V("y")),
      TriplePattern(V("x"), C("scan"), V("y")))
    // read bindings BY NAME: the output column order follows variable
    // first-appearance order, which legitimately differs across pattern
    // permutations (SPARQL imposes none; the driver compare sorts by name)
    def byName(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("x"), r.getAs[String]("m"),
        r.getAs[String]("y"))).toSet
    val got = byName(BgpMatcher.matchBgp(edgesDf, pats))
    assert(got == Set(("a", "b", "c")))
    // pattern order must not change the result (the compiler reorders)
    assert(byName(BgpMatcher.matchBgp(edgesDf, pats.reverse)) == got)
  }

  test("BGP constant subject anchors the chain") {
    val got = BgpMatcher.matchBgp(edgesDf, Seq(
        TriplePattern(C("b"), C("group"), V("y"))))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("c", "d"))
  }

  test("BGP repeated variable within a pattern means equality (self-loop)") {
    val got = BgpMatcher.matchBgp(edgesDf, Seq(
        TriplePattern(V("x"), V("p"), V("x"))))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "sort")))
  }

  test("BGP variable predicate joins across patterns") {
    // same predicate twice in a length-2 path: only group/group chains
    // b -group-> c? c has no out-group; b -group-> d, d no out-group —
    // add one so the pattern has a witness
    val df = (kgEdges :+ ("d", "group", "e")).toDF("subj", "pred", "obj")
    val got = BgpMatcher.matchBgp(df, Seq(
        TriplePattern(V("x"), V("p"), V("m")),
        TriplePattern(V("m"), V("p"), V("y"))))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).toSet
    assert(got.contains(("b", "group", "d", "e")))
    // every result chains the SAME predicate twice
    assert(got.forall { case (x, p, m, y) =>
      kgEdges.contains((x, p, m)) || (x, p, m) == ("d", "group", "e") })
  }

  test("BGP fully-constant pattern acts as an existence gate") {
    val pats = Seq(
      TriplePattern(V("x"), C("merge"), V("y")),
      TriplePattern(C("a"), C("scan"), C("c"))) // present -> gate passes
    val got = BgpMatcher.matchBgp(edgesDf, pats).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("d", "e")))
    val gated = BgpMatcher.matchBgp(edgesDf, Seq(
      TriplePattern(V("x"), C("merge"), V("y")),
      TriplePattern(C("a"), C("scan"), C("zzz")))) // absent -> empty
    assert(gated.isEmpty)
  }

  test("BGP OPTIONAL pattern left-joins: unmatched rows keep NULL") {
    // a filter b (b gets a merge edge), and c filter f (f has none)
    val df = (kgEdges :+ ("c", "filter", "f") :+ ("b", "merge", "e"))
      .toDF("subj", "pred", "obj")
    val got = BgpMatcher.matchBgp(df,
        Seq(TriplePattern(V("x"), C("filter"), V("m"))),
        optionals = Seq(TriplePattern(V("m"), C("merge"), V("z"))))
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("m"),
        Option(r.getAs[String]("z")))).toSet
    assert(got == Set(("a", "b", Some("e")), ("c", "f", None)))
  }

  test("BGP OPTIONAL without a shared or fresh variable is rejected") {
    val noShare = intercept[IllegalArgumentException] {
      BgpMatcher.matchBgp(edgesDf,
        Seq(TriplePattern(V("x"), C("filter"), V("m"))),
        optionals = Seq(TriplePattern(V("q"), C("merge"), V("z"))))
    }
    assert(noShare.getMessage.contains("shares no variable"))
    val noFresh = intercept[IllegalArgumentException] {
      BgpMatcher.matchBgp(edgesDf,
        Seq(TriplePattern(V("x"), C("filter"), V("m"))),
        optionals = Seq(TriplePattern(V("x"), C("scan"), V("m"))))
    }
    assert(noFresh.getMessage.contains("binds no new variable"))
  }

  test("BGP FILTER: inequality prunes bindings; placement is semantic-free") {
    // add a scan edge so x=a binds y in {b, c}: FILTER(m != y) must drop
    // exactly the m == y binding
    val df = (kgEdges :+ ("a", "scan", "b")).toDF("subj", "pred", "obj")
    val pats = Seq(
      TriplePattern(V("x"), C("filter"), V("m")),
      TriplePattern(V("x"), C("scan"), V("y")))
    def run(ps: Seq[TriplePattern]) =
      BgpMatcher.matchBgp(df, ps, filters = Seq(col("m") =!= col("y")))
        .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("m"),
          r.getAs[String]("y"))).toSet
    assert(run(pats) == Set(("a", "b", "c")))
    // the compiler's earliest-placement must not change the result under
    // a different join order (filter lands after a different join)
    assert(run(pats.reverse) == Set(("a", "b", "c")))
  }

  test("BGP FILTER on an optional variable: NULL rows drop under <op>") {
    // a filter b (b merge e), c filter f (f has no merge edge): the z
    // filter sees NULL for the unmatched row and drops it (SQL NULL =
    // SPARQL error-is-false)
    val df = (kgEdges :+ ("c", "filter", "f") :+ ("b", "merge", "e"))
      .toDF("subj", "pred", "obj")
    val got = BgpMatcher.matchBgp(df,
        Seq(TriplePattern(V("x"), C("filter"), V("m"))),
        optionals = Seq(TriplePattern(V("m"), C("merge"), V("z"))),
        filters = Seq(col("z") === "e"))
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("z")))
      .toSet
    assert(got == Set(("a", "e")))
  }

  test("BGP FILTER referencing an unbound or no variable is rejected") {
    val unbound = intercept[IllegalArgumentException] {
      BgpMatcher.matchBgp(edgesDf,
        Seq(TriplePattern(V("x"), C("filter"), V("m"))),
        filters = Seq(col("nope") === "a"))
    }
    assert(unbound.getMessage.contains("unbound name"))
    val novar = intercept[IllegalArgumentException] {
      BgpMatcher.matchBgp(edgesDf,
        Seq(TriplePattern(V("x"), C("filter"), V("m"))),
        filters = Seq(lit(1) === 1))
    }
    assert(novar.getMessage.contains("references no BGP variable"))
  }

  test("BGP UNION: branch-wise vars, NULL for unbound, bag semantics") {
    import BgpMatcher.Bgp
    val branches = Seq(
      Bgp(Seq(TriplePattern(V("x"), C("merge"), V("y")))),
      Bgp(Seq(TriplePattern(V("x"), C("filter"), V("m")),
        TriplePattern(V("m"), C("group"), V("y")))))
    val got = BgpMatcher.matchBgpUnion(edgesDf, branches)
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("y"),
        Option(r.getAs[String]("m")))).toSet
    assert(got == Set(
      ("d", "e", None), // merge branch: m unbound
      ("a", "c", Some("b")), ("a", "d", Some("b"))))
    // bag semantics: duplicating a branch duplicates its solutions
    val bag = BgpMatcher.matchBgpUnion(edgesDf,
      Seq(branches.head, branches.head))
    assert(bag.count() == 2 && bag.distinct().count() == 1)
  }

  // ------------------------------------------------- transitive closure

  /** Brute-force reference: all directed paths up to maxDepth, min hops. */
  private def refClosure(edges: Seq[(String, String)], cap: Int)
      : Set[(String, String, Int)] = {
    val e = edges.distinct
    var reach = e.map { case (a, b) => (a, b) -> 1 }.toMap
    var frontier = reach
    for (d <- 2 to cap) {
      val next = for {
        ((a, b), _) <- frontier.toSeq
        (b2, c) <- e if b2 == b && !reach.contains((a, c))
      } yield (a, c) -> d
      frontier = next.toMap
      reach ++= frontier
    }
    reach.map { case ((a, b), d) => (a, b, d) }.toSet
  }

  private def runClosure(edges: Seq[(String, String)], cap: Int)
      : Set[(String, String, Int)] =
    GraphOps.transitiveClosure(edges.toDF("src", "dst"), cap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet

  test("transitiveClosure on a chain gives all suffix pairs with min dist") {
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    assert(runClosure(chain, 4) == Set(
      ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
      ("a", "c", 2), ("b", "d", 2), ("a", "d", 3)))
    // depth cap bites: cap 2 drops the 3-hop pair
    assert(runClosure(chain, 2) ==
      refClosure(chain, 2))
  }

  test("transitiveClosure is cycle-safe and keeps the SHORTEST distance") {
    // cycle a->b->c->a plus a shortcut a->c: dist(a,c) must be 1, and
    // the cycle yields self-pairs at their cycle length
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
    val got = runClosure(g, 5)
    assert(got == refClosure(g, 5))
    assert(got.contains(("a", "c", 1)), "shortcut must win over the chain")
    assert(got.contains(("a", "a", 2)), "a->c->a closes the 2-cycle")
  }

  test("transitiveClosure short-circuits on a DAG (cap beyond diameter)") {
    // diameter 2; a huge cap must return the same closed set, not loop
    val dag = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    assert(runClosure(dag, 50) == refClosure(dag, 50))
  }

  test("CONSTRUCT materializes rule heads, newOnly drops observed edges") {
    // closed grounding (a,b,c): scan edge exists -> excluded by newOnly;
    // open grounding (a,b,d): no scan edge -> inferred
    val body = Seq(
      TriplePattern(V("x"), C("filter"), V("m")),
      TriplePattern(V("m"), C("group"), V("y")))
    val head = TriplePattern(V("x"), C("scan"), V("y"))
    val inferred = BgpMatcher.construct(edgesDf, body, head)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(inferred == Set(("a", "scan", "d")))
    // newOnly = false keeps the closed grounding too
    val all = BgpMatcher.construct(edgesDf, body, head, newOnly = false)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(all == Set(("a", "c"), ("a", "d")))
    // a head variable the body never binds is rejected
    val bad = intercept[IllegalArgumentException] {
      BgpMatcher.construct(edgesDf, body,
        TriplePattern(V("x"), C("scan"), V("zz")))
    }
    assert(bad.getMessage.contains("not bound"))
  }

  test("MINUS drops compatible solutions, keeps NULL-keyed optional rows") {
    import BgpMatcher.Bgp
    val e = Seq(
      ("a", "filter", "b"), ("c", "filter", "d"), // two required solutions
      ("b", "merge", "e"),                        // optional binds z=e for (a,b)
      ("k", "sort", "e"))                         // minus group binds z=e
      .toDF("subj", "pred", "obj")
    val got = BgpMatcher.matchBgpMinus(e,
        required = Bgp(Seq(TriplePattern(V("x"), C("filter"), V("m"))),
          optionals = Seq(TriplePattern(V("m"), C("merge"), V("z")))),
        minus = Bgp(Seq(TriplePattern(V("q"), C("sort"), V("z")))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    // (a,b,e) is compatible with the minus solution z=e -> dropped;
    // (c,d,NULL)'s unbound shared variable matches nothing -> kept
    assert(got == Set(("c", "d", null)))
    // plain subtraction on two shared variables
    val both = BgpMatcher.matchBgpMinus(e,
        required = Bgp(Seq(TriplePattern(V("x"), C("filter"), V("m")))),
        minus = Bgp(Seq(TriplePattern(V("x"), C("filter"), C("b")),
          TriplePattern(V("x"), C("filter"), V("m")))))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(both == Set(("c", "d")), "only the b-anchored solution subtracts")
    // a domain-disjoint MINUS is rejected (SPARQL's silent no-op is a bug)
    val bad = intercept[IllegalArgumentException] {
      BgpMatcher.matchBgpMinus(e,
        required = Bgp(Seq(TriplePattern(V("x"), C("filter"), V("m")))),
        minus = Bgp(Seq(TriplePattern(V("q"), C("sort"), V("z")))))
    }
    assert(bad.getMessage.contains("shares no variable"))
  }

  test("catalog MINUS agrees with a naive recount on testdata") {
    val dir = "/root/testdata/sf0.001"
    val dRank = Queries.kgDictWords.zipWithIndex.toMap
    val pRank = Queries.kgPredWords.zipWithIndex.toMap
    val train = Queries.kgTypedTriples(spark, dir)
      .select(col("subj"), col("pred"), col("obj")).distinct()
      .as[(String, String, String)].collect()
      .filter { case (s, p, o) =>
        (dRank(s) * 25 + pRank(p) * 5 + dRank(o)) % 4 != 3 }
      .toSet
    val expected = train.collect {
      case (x, "filter", m) if !train.contains((x, "scan", m)) => (x, m)
    }
    val got = Queries.kgBgpMinus(spark, dir)
      .as[(String, String)].collect().toSet
    assert(got == expected && got.nonEmpty)
    assert(train.exists { case (x, p, m) =>
      p == "filter" && train.contains((x, "scan", m)) },
      "the subtraction must actually drop something")
  }

  test("VALUES restricts, extends with payload columns, keeps bag semantics") {
    import BgpMatcher.withValues
    val sols = BgpMatcher.matchBgp(edgesDf,
      Seq(TriplePattern(V("x"), C("filter"), V("m")))) // one solution (a,b)
    // restriction + payload extension
    val v1 = Seq(("a", "g1"), ("zz", "g2")).toDF("x", "grp")
    val got = withValues(sols, v1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == Set(("a", "b", "g1")))
    // a non-matching VALUES list removes everything
    assert(withValues(sols, Seq("zz").toDF("x")).isEmpty)
    // bag semantics: a duplicated VALUES row duplicates the solution
    val dup = Seq("a", "a").toDF("x")
    assert(withValues(sols, dup).count() == 2)
    // a domain-disjoint VALUES is rejected
    val bad = intercept[IllegalArgumentException] {
      withValues(sols, Seq("g").toDF("unrelated"))
    }
    assert(bad.getMessage.contains("shares no variable"))
  }

  test("matchBgpSources: vertical partitioning equals the single-table BGP") {
    // split the edge table per predicate (the classic SPARQL vertical
    // partitioning) and hand each pattern its own relation — same rows
    val pats = Seq(
      TriplePattern(V("x"), C("filter"), V("m")),
      TriplePattern(V("m"), C("group"), V("y")),
      TriplePattern(V("x"), C("scan"), V("y")))
    def perPred(p: String) =
      kgEdges.filter(_._2 == p).toDF("subj", "pred", "obj")
    val got = BgpMatcher.matchBgpSources(Seq(
        (pats(0), perPred("filter")),
        (pats(1), perPred("group")),
        (pats(2), perPred("scan"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    val whole = BgpMatcher.matchBgp(edgesDf, pats)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == whole && got == Set(("a", "b", "c")))
  }

  test("constructDelta: semi-naive branches, observation beats inference") {
    val body = Seq(
      TriplePattern(V("x"), C("filter"), V("m")),
      TriplePattern(V("m"), C("group"), V("y")))
    val head = TriplePattern(V("x"), C("scan"), V("y"))
    // old graph: a full old-only grounding (p,q,r) plus two half-bridges
    val old = Seq(
      ("p", "filter", "q"), ("q", "group", "r"),   // old-only grounding
      ("a", "filter", "b"),                        // waits for a delta group
      ("m", "group", "n"))                         // waits for a delta filter
      .toDF("subj", "pred", "obj")
    // delta: bridges both directions, one delta-only grounding, and an
    // ASSERTION of a previously-inferred edge (p scan r becomes observed)
    val delta = Seq(
      ("b", "group", "c"),                         // old filter + new group
      ("l", "filter", "m"),                        // new filter + old group
      ("u", "filter", "v"), ("v", "group", "w"),   // delta-only grounding
      ("p", "scan", "r"))                          // observation beats inference
      .toDF("subj", "pred", "obj")
    val oldDerived = BgpMatcher.construct(old, body, head, newOnly = false)
    val got = BgpMatcher.constructDelta(old, delta, oldDerived, body, head)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    // (p,scan,r) is now observed -> out; the three delta-touching
    // groundings are in; equals the full recompute
    val full = BgpMatcher.construct(old.unionByName(delta), body, head)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == full)
    assert(got == Set(("a", "scan", "c"), ("l", "scan", "n"),
      ("u", "scan", "w")))
    // behavioral proof the old graph is never re-ground against itself:
    // an EMPTY stored derivation loses exactly the old-only grounding —
    // if the delta path recomputed old×old, (p,scan,r)'s sibling
    // derivation (p,q,r) would resurface here regardless of the store
    val noStore = BgpMatcher.constructDelta(old,
        delta.filter(col("pred") =!= "scan"),
        oldDerived.limit(0), body, head)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(!noStore.contains(("p", "scan", "r")),
      "old-only grounding must come from the store, not a re-grounding")
    assert(noStore == Set(("a", "scan", "c"), ("l", "scan", "n"),
      ("u", "scan", "w")))
  }

  test("BGP rejects a disconnected pattern set") {
    val e = intercept[IllegalArgumentException] {
      BgpMatcher.matchBgp(edgesDf, Seq(
        TriplePattern(V("x"), C("filter"), V("m")),
        TriplePattern(V("q"), C("merge"), V("z")))) // shares no var
    }
    assert(e.getMessage.contains("disconnected"))
  }

  test("BGP connected plan contains no cartesian product") {
    val pats = Seq(
      TriplePattern(V("x"), C("filter"), V("m")),
      TriplePattern(V("m"), C("group"), V("y")),
      TriplePattern(V("x"), C("scan"), V("y")))
    val plan = BgpMatcher.matchBgp(edgesDf, pats)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"connected BGP must compile to equi-joins only:\n$plan")
  }
}
