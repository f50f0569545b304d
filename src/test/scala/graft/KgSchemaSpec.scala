package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed-predicate schema-induction family: typed extraction,
  * predicate stats (functionality + modal domain/range), meta-paths,
  * LCG negative sampling, N-Triples export. Hand-built corpora with
  * by-hand expected outputs, plus property checks on the driver testdata. */
class KgSchemaSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("typed extraction: one triple per (pair present, pred present)") {
    val d = docs(
      1L -> "customer vector merge",
      2L -> "customer part stream filter sort",
      3L -> "customer merge",          // pred, but no entity pair
      4L -> "vector column",           // pair, but no pred
      5L -> "big slow query")          // neither
    val got = Queries.kgTypedTriplesOf(d)
      .as[(Long, String, String, String)].collect().toSet
    val expected = Set(
      (1L, "customer", "merge", "vector"),
      (2L, "customer", "filter", "part"),
      (2L, "customer", "sort", "part"),
      (2L, "customer", "filter", "stream"),
      (2L, "customer", "sort", "stream"),
      (2L, "part", "filter", "stream"),
      (2L, "part", "sort", "stream"))
    assert(got == expected)
  }

  test("predicate stats: functionality ratios and modal domain/range") {
    val d = docs(
      1L -> "customer vector merge",
      2L -> "customer column merge",
      3L -> "customer vector sort",
      4L -> "vector stream sort")
    // reuse the catalog query's body over a temp table by calling the
    // internal pieces: stats are defined over kgTypedTriplesOf
    val stats = Queries.kgPredicateStatsOf(Queries.kgTypedTriplesOf(d))
      .collect().map(r => r.getString(0) -> r).toMap
    val merge = stats("merge")
    // merge edges: (customer,vector), (customer,column): 1 subj, 2 obj
    assert(merge.getLong(1) == 2 && merge.getLong(2) == 2) // n_triples, n_docs
    assert(merge.getLong(3) == 2 && merge.getLong(4) == 1 && merge.getLong(5) == 2)
    assert(merge.getLong(6) == 500 && merge.getLong(7) == 1000)
    assert(merge.getString(8) == "biz" && merge.getString(9) == "data")
    // sort edges: (customer,vector) biz->data, (vector,stream) data->data:
    // domain tie biz=1/data=1 resolves to the lexicographic min 'biz'
    val sort = stats("sort")
    assert(sort.getString(8) == "biz" && sort.getString(9) == "data")
  }

  test("metapaths: length-2 predicate paths over the distinct edge set") {
    val d = docs(
      1L -> "customer vector merge",  // (customer, merge, vector)
      2L -> "vector stream sort")     // (vector, sort, stream)
    val got = Queries.kgMetapathsOf(Queries.kgTypedTriplesOf(d))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("merge", "sort", 1L, 1L)))
  }

  test("catalog metapaths agrees with a naive recount on testdata") {
    val e = Queries.kgTypedTriples(spark, dir)
      .select(col("subj"), col("pred"), col("obj")).distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val naive = (for {
      (s1, p1, o1) <- e; (s2, p2, o2) <- e; if o1 == s2
    } yield (p1, p2, o1)).groupBy(t => (t._1, t._2))
      .map { case ((p1, p2), xs) =>
        (p1, p2, xs.length.toLong, xs.map(_._3).distinct.length.toLong) }
      .toSet
    val got = Queries.kgMetapaths(spark, dir)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == naive && got.nonEmpty)
  }

  test("negatives: never a shipped edge (canonical orientation), no self-corruption") {
    val neg = Queries.kgNegatives(spark, dir).cache()
    try {
      assert(neg.count() > 0)
      assert(neg.filter(col("neg_obj") === col("subj") ||
        col("neg_obj") === col("obj")).count() == 0)
      // canonicalize the corrupted pair by dictionary rank and probe the
      // SHIPPED edge set (the anti-join truth): must be empty by
      // construction
      val rank = Queries.kgDictWords.zipWithIndex.toMap
      val shipped = Queries.kgShippedEdgesOf(Queries.kgTypedTriples(spark, dir))
        .collect().map(r => (r.getString(1), r.getString(0), r.getString(2)))
      val truth = shipped.map { case (p, s, o) => (s, p, o) }.toSet
      val collisions = neg.collect().filter { r =>
        val (s, p, n) = (r.getString(0), r.getString(1), r.getString(3))
        val (cs, co) = if (rank(s) < rank(n)) (s, n) else (n, s)
        truth.contains((cs, p, co))
      }
      assert(collisions.isEmpty, s"negatives collide with truth: ${collisions.take(3).mkString(",")}")
      // every negative derives from a shipped edge
      val shippedKeys = truth
      neg.collect().foreach { r =>
        assert(shippedKeys.contains((r.getString(0), r.getString(1), r.getString(2))))
      }
      // deterministic: a second evaluation is bit-identical
      val again = Queries.kgNegatives(spark, dir).collect().toSet
      assert(neg.collect().toSet == again)
    } finally neg.unpersist()
  }

  test("shipped edges: support threshold is per-predicate and permille-exact") {
    // pred 'merge': (customer,vector) in 100 docs, (customer,column) in 1
    // — at 970‰ of pmax=100 only the strong edge ships; the weak pair is
    // then a legal corruption target for negatives
    val rows = (1L to 100L).map(i => i -> "customer vector merge") :+
      (200L -> "customer column merge")
    val d = docs(rows: _*)
    val t = Queries.kgTypedTriplesOf(d)
    val shipped = Queries.kgShippedEdgesOf(t)
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(shipped.map(e => (e._1, e._2, e._3)) ==
      Set(("customer", "merge", "vector")))
    // the 100-doc edge's LCG index is ((1*1103515245 + 100*12345 + 7) %
    // 2147483647) % 5 = 2 → 'vector' = the observed object, so the
    // observed-corruption filter drops the only candidate: zero negatives
    assert(Queries.kgNegativesOf(t).count() == 0)
    // a single-doc corpus at doc_id 7 indexes to 1 → 'part', which is
    // neither subj, obj, nor a shipped pair — exactly one negative row
    val negT = Queries.kgTypedTriplesOf(docs(7L -> "customer vector merge"))
    val neg = Queries.kgNegativesOf(negT)
      .as[(String, String, String, String)].collect().toSeq
    assert(neg == Seq(("customer", "merge", "vector", "part")))
    // boundary: at exactly the threshold the edge still ships
    // (n_docs*1000 >= keep‰ * pmax with equality)
    val d2 = docs((1L to 100L).map(i => i -> "customer vector merge") ++
      (201L to 297L).map(i => i -> "customer column merge"): _*)
    val s2 = Queries.kgShippedEdgesOf(Queries.kgTypedTriplesOf(d2))
      .as[(String, String, String, Long, Long)].collect()
      .map(e => (e._1, e._2, e._3)).toSet
    assert(s2 == Set(("customer", "merge", "vector"),
      ("customer", "merge", "column")))
  }

  test("negatives: the LCG index arithmetic matches a by-hand row") {
    val d = docs(7L -> "customer vector merge") // single edge, n_docs=1, first_doc=7
    val roll = Queries.kgTypedTriplesOf(d)
      .groupBy(col("subj"), col("pred"), col("obj"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
    val r = roll.head()
    val idx = (((7L * 1103515245L + 1L * 12345L + 7L) % 2147483647L)
      % Queries.kgDictWords.length).toInt
    val expected = Queries.kgDictWords(idx)
    // engine result for the same single-edge corpus
    val idxCol = ((col("first_doc") * lit(1103515245L) + col("n_docs") * lit(12345L)
      + lit(7L)) % lit(2147483647L)) % lit(Queries.kgDictWords.length.toLong)
    val got = roll.select(idxCol.cast("int").as("i")).head().getInt(0)
    assert(got == idx, s"LCG index mismatch: engine $got, by-hand $idx")
    assert(r.getLong(3) == 1L && r.getLong(4) == 7L)
    assert(Queries.kgDictWords.indices.contains(idx) && expected.nonEmpty)
  }

  test("ntriples: statement and provenance lines rebuild byte-for-byte") {
    val rows = Queries.kgNtriples(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, p, o, n) = (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))
      assert(r.getString(4) == s"<urn:graft:e:$s> <urn:graft:p:$p> <urn:graft:e:$o> .")
      assert(r.getString(5) ==
        s"""<urn:graft:x:$s:$p:$o> <urn:graft:p:n_docs> "$n"^^<http://www.w3.org/2001/XMLSchema#integer> .""")
    }
  }

  test("rules: closed-world confidence on a hand-built grounding") {
    // body filter(x,m) ∧ filter(m,y) has ONE grounding (customer,vector)
    // via mid=part; head group(customer,vector) closes it → conf 1000‰
    val d = docs(
      1L -> "customer part filter",
      2L -> "part vector filter",
      3L -> "customer vector group")
    val got = Queries.kgRulesOf(Queries.kgTypedTriplesOf(d))
      .as[(String, String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(("filter", "filter", "group", 1L, 1L, 1000L)))
    // drop the head edge: the body still grounds but nothing closes it —
    // open rules are not emitted
    val open = Queries.kgRulesOf(Queries.kgTypedTriplesOf(
      docs(1L -> "customer part filter", 2L -> "part vector filter")))
    assert(open.count() == 0)
  }

  test("rules: catalog entry agrees with a naive recount on testdata") {
    val e = Queries.kgTypedTriples(spark, dir)
      .select(col("subj"), col("pred"), col("obj")).distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val paths: Seq[(String, String, String, String)] = (for {
      (x, p1, m1) <- e.toSeq; (m2, p2, y) <- e.toSeq; if m1 == m2
    } yield (p1, p2, x, y)).distinct
    val nPairs: Map[(String, String), Int] =
      paths.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.length }
    val heads: Map[(String, String), Seq[String]] =
      e.toSeq.map(t => (t._1, t._3) -> t._2).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2) }
    val closures: Seq[(String, String, String)] =
      paths.flatMap { case (p1, p2, x, y) =>
        heads.getOrElse((x, y), Seq.empty[String]).map(ph => (p1, p2, ph))
      }
    val naive = closures.groupBy(c => c).map { case ((p1, p2, ph), v) =>
      val np = nPairs((p1, p2)).toLong
      (p1, p2, ph, np, v.length.toLong, v.length.toLong * 1000L / np)
    }.toSet
    val got = Queries.kgRules(spark, dir)
      .as[(String, String, String, Long, Long, Long)].collect().toSet
    assert(got == naive && got.nonEmpty)
  }

  test("inverse rules: sees patterns the plain miner cannot; plain rows " +
    "carry identical counts") {
    // (a,p,b) and (c,q,b) chain only through q's INVERSE: a -p-> b -q⁻¹-> c;
    // head (a,r,c) closes it — invisible to the stored-orientation miner
    val t = Seq(
      ("a", "p", "b"), ("c", "q", "b"), ("a", "r", "c"))
      .toDF("subj", "pred", "obj")
    val rules = Queries.kgRulesInverseOf(t)
      .as[(String, String, String, Long, Long, Long)].collect().toSet
    assert(rules.contains(("p", "q^-1", "r", 1L, 1L, 1000L)),
      "the inverse-body rule must be mined")
    assert(rules.forall(r => !r._3.endsWith("^-1")),
      "inverse heads are restatements and must drop")
    val plain = Queries.kgRulesOf(t)
      .as[(String, String, String, Long, Long, Long)].collect().toSet
    assert(!plain.exists(r => r._1 == "p" && r._3 == "r"),
      "the plain miner must NOT see the inverse-body pattern")
    // on the testdata graph: restricting the inverse miner to rules whose
    // body uses no inverse predicate reproduces kgRules exactly —
    // augmentation adds rows only under new predicate names
    val full = Queries.kgTypedTriples(spark, dir)
      .select(col("subj"), col("pred"), col("obj"))
    val restricted = Queries.kgRulesInverseOf(full)
      .filter(!col("pred_a").endsWith("^-1") &&
        !col("pred_b").endsWith("^-1"))
      .as[(String, String, String, Long, Long, Long)].collect().toSet
    val base = Queries.kgRulesOf(full)
      .as[(String, String, String, Long, Long, Long)].collect().toSet
    assert(restricted == base && base.nonEmpty)
  }

  test("mined-rule application: gates, best-confidence dedup, anti-join") {
    // two chain-2 rules into head h: (p,q) with 4 groundings / 2 closed
    // (conf 500) and (t,u) with 3 groundings / 2 closed (conf 666); the
    // open grounding (a3,b3) is predicted by BOTH (max-conf dedup) and
    // (a4,b4) by (p,q) alone; every closed grounding anti-joins away
    val edges = Seq(
      ("a1", "p", "m1"), ("a2", "p", "m2"), ("a3", "p", "m3"),
      ("a4", "p", "m4"),
      ("m1", "q", "b1"), ("m2", "q", "b2"), ("m3", "q", "b3"),
      ("m4", "q", "b4"),
      ("a5", "t", "n1"), ("a6", "t", "n2"), ("a3", "t", "n0"),
      ("n1", "u", "b5"), ("n2", "u", "b6"), ("n0", "u", "b3"),
      ("a1", "h", "b1"), ("a2", "h", "b2"), ("a5", "h", "b5"),
      ("a6", "h", "b6")).toDF("subj", "pred", "obj")
    val rules = Queries.kgRulesOf(edges)
    assert(rules.as[(String, String, String, Long, Long, Long)]
      .collect().toSet == Set(("p", "q", "h", 4L, 2L, 500L),
        ("t", "u", "h", 3L, 2L, 666L)))
    def got(minConf: Int, minPairs: Long) =
      graph.GraphOps.applyMinedRules(edges, rules, minConf, minPairs)
        .as[(String, String, String, Long)].collect().toSet
    assert(got(500, 2) ==
      Set(("a3", "h", "b3", 666L), ("a4", "h", "b4", 500L)))
    // confidence gate drops (p,q): a4 vanishes, a3 keeps rule2's conf
    assert(got(600, 2) == Set(("a3", "h", "b3", 666L)))
    // support gate drops (t,u): a3 falls back to rule1's conf
    assert(got(500, 4) ==
      Set(("a3", "h", "b3", 500L), ("a4", "h", "b4", 500L)))
    assert(got(500, 5) == Set.empty[(String, String, String, Long)])
  }

  test("mined-rule application agrees with per-rule CONSTRUCT on testdata") {
    import graph.BgpMatcher.{C, TriplePattern, V}
    // rebuild the catalog's 75% train split by hand (independent recount
    // of edgeSplitCode: subj rank·25 + pred rank·5 + obj rank, keep ≠3
    // mod 4), then re-derive the applied rules via the CONSTRUCT path
    val dRank = Queries.kgDictWords.zipWithIndex.toMap
    val pRank = Queries.kgPredWords.zipWithIndex.toMap
    val code = udf((s: String, p: String, o: String) =>
      dRank(s) * 25 + pRank(p) * 5 + dRank(o))
    val e = Queries.kgTypedTriples(spark, dir)
      .select(col("subj"), col("pred"), col("obj")).distinct()
      .filter(code(col("subj"), col("pred"), col("obj")) % 4 =!= 3)
      .localCheckpoint()
    val rules = Queries.kgRulesOf(e)
      .filter(col("conf_permille") >= Queries.RuleConfGatePermille &&
        col("n_pairs") >= Queries.RuleMinPairs)
      .as[(String, String, String, Long, Long, Long)].collect()
    assert(rules.nonEmpty, "catalog gates must keep rules on the train split")
    val viaConstruct = rules.map { case (pa, pb, ph, _, _, conf) =>
      graph.BgpMatcher.construct(e, Seq(
          TriplePattern(V("x"), C(pa), V("m")),
          TriplePattern(V("m"), C(pb), V("y"))),
        TriplePattern(V("x"), C(ph), V("y")))
        .withColumn("conf_permille", lit(conf))
    }.reduce(_ unionByName _)
      .groupBy(col("subj"), col("pred"), col("obj"))
      .agg(max(col("conf_permille")).as("conf_permille"))
      .as[(String, String, String, Long)].collect().toSet
    val got = Queries.kgRuleApply(spark, dir)
      .as[(String, String, String, Long)].collect().toSet
    assert(got == viaConstruct && got.nonEmpty)
  }

  test("rule infer: non-vacuous on the train split, sound vs the body join") {
    // The catalog entry runs the pinned CONSTRUCT over the 75% training
    // split precisely because the saturated closed-vocabulary KG makes
    // the full-graph anti-join vacuously empty — this pins both halves:
    // the split leaves something to infer, and every inferred edge is a
    // genuine body grounding absent from the training graph.
    val dRank = Queries.kgDictWords.zipWithIndex.toMap
    val pRank = Queries.kgPredWords.zipWithIndex.toMap
    val train = Queries.kgTypedTriples(spark, dir)
      .select(col("subj"), col("pred"), col("obj")).distinct()
      .as[(String, String, String)].collect()
      .filter { case (s, p, o) => (dRank(s) * 25 + pRank(p) * 5 + dRank(o)) % 4 != 3 }
      .toSet
    val expected = (for {
      (x, pa, m) <- train if pa == "filter"
      (m2, pb, y) <- train if pb == "group" && m2 == m
      if !train.contains((x, "scan", y))
    } yield (x, "scan", y)).toSet
    val got = Queries.kgRuleInfer(spark, dir)
      .as[(String, String, String)].collect().toSet
    assert(got.nonEmpty, "the split must leave the pinned rule something to infer")
    assert(got == expected)
  }

  test("rule infer delta: equals the full recompute, both slices non-trivial") {
    // the catalog twin: kg_rule_infer_delta shares kg_rule_infer's oracle
    // SQL, so delta == full must hold bit-for-bit here too — and the
    // demonstration is only meaningful if the old slice actually stores
    // derivations AND the delta slice actually adds groundings
    val full = Queries.kgRuleInfer(spark, dir)
      .as[(String, String, String)].collect().toSet
    val got = Queries.kgRuleInferDelta(spark, dir)
      .as[(String, String, String)].collect().toSet
    assert(got == full && got.nonEmpty)
    val dRank = Queries.kgDictWords.zipWithIndex.toMap
    val pRank = Queries.kgPredWords.zipWithIndex.toMap
    def code(s: String, p: String, o: String) =
      dRank(s) * 25 + pRank(p) * 5 + dRank(o)
    val train = Queries.kgTypedTriples(spark, dir)
      .select(col("subj"), col("pred"), col("obj")).distinct()
      .as[(String, String, String)].collect()
      .filter { case (s, p, o) => code(s, p, o) % 4 != 3 }
    val (delta, old) = train.partition { case (s, p, o) =>
      code(s, p, o) % 4 == 2
    }
    assert(old.nonEmpty && delta.nonEmpty, "both slices must be inhabited")
    def groundings(e: Set[(String, String, String)]) = for {
      (x, pa, m) <- e if pa == "filter"
      (m2, pb, y) <- e if pb == "group" && m2 == m
    } yield (x, y)
    val oldG = groundings(old.toSet)
    val allG = groundings(train.toSet)
    assert(oldG.nonEmpty, "the stored derivation must be non-empty")
    assert((allG -- oldG).nonEmpty,
      "the delta must add groundings the store lacks")
  }

  test("completion eval: one internally-consistent row on testdata") {
    val rows = Queries.kgCompletionEval(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (ni, nh, nhit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nh > 0, "the held-out quarter must assert some unique edges")
    assert(nhit <= math.min(ni, nh))
    assert(r.getLong(3) == (if (ni == 0) 0L else nhit * 1000 / ni))
    assert(r.getLong(4) == (if (nh == 0) 0L else nhit * 1000 / nh))
  }

  test("schema violations: only deviating edges, correct side flags") {
    // merge edges: (customer,vector), (vector,stream) — domain tie
    // biz=1/data=1 → 'biz' (lexicographic min), range 'data'; the
    // data-subject edge violates the domain only
    val d = docs(
      1L -> "customer vector merge",
      2L -> "vector stream merge")
    val got = Queries.kgSchemaViolationsOf(Queries.kgTypedTriplesOf(d))
      .as[(String, String, String, String, String, String, String, Int, Int)]
      .collect().toSet
    assert(got == Set(
      ("vector", "merge", "stream", "data", "data", "biz", "data", 1, 0)))
    // the stats join must broadcast (|preds| rows)
    val plan = Queries.kgSchemaViolations(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
  }

  test("edge diff: equals a naive recount over the parity halves") {
    val tr = Queries.kgTriplesOf(
      spark.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"), col("subj"), col("pred"), col("obj")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def roll(par: Long) = tr.filter(_._1 % 2 == par)
      .groupBy(t => (t._2, t._3, t._4)).map { case (k, v) => k -> v.length.toLong }
    val (o, n) = (roll(0), roll(1))
    val naive = (o.keySet ++ n.keySet).map { k =>
      val (no, nn) = (o.getOrElse(k, 0L), n.getOrElse(k, 0L))
      val status =
        if (no == 0) "added" else if (nn == 0) "removed"
        else if (no != nn) "changed" else "same"
      (k._1, k._2, k._3, no, nn, nn - no, status)
    }
    val got = Queries.kgEdgeDiff(spark, dir)
      .as[(String, String, String, Long, Long, Long, String)].collect().toSet
    assert(got == naive && got.nonEmpty)
  }

  test("provenance: exactly min(3, n_docs) exemplar docs per edge, hash-ranked") {
    import graft.operators.Dedup.{HashA, HashB, HashP}
    val tr = Queries.kgTriples(spark, dir)
      .select(col("doc_id"), col("subj"), col("pred"), col("obj")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val naive = tr.groupBy(t => (t._2, t._3, t._4)).toSeq.flatMap { case (k, v) =>
      v.map(_._1).distinct.toSeq
        .sortBy(d => ((HashA(3) * d + HashB(3)) % HashP, d))
        .take(3).zipWithIndex
        .map { case (d, i) => (k._1, k._2, k._3, d, i.toLong + 1L) }
    }.toSet
    val got = Queries.kgProvenance(spark, dir)
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(got == naive && got.nonEmpty)
  }

  test("pred lexicon words are not substrings of any vocabulary word") {
    // the replace-counting identity kgTypedTriplesOf relies on (same
    // contract as kgDictWords, asserted in OperatorsSpec for those)
    val vocab = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect()
    for (p <- Queries.kgPredWords; v <- vocab; if v != p)
      assert(!v.contains(p), s"'$p' is a substring of vocabulary word '$v'")
  }
}
