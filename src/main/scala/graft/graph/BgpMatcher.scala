package graft.graph

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** SPARQL-style BASIC GRAPH PATTERN matching over the constructed KG —
  * the consumer-side query surface of a triple store: once extraction +
  * rollup have shipped an edge table, the first thing a downstream user
  * does is ask pattern queries ("find every x that filters some m which
  * groups a y that x also scans"). This is the declarative compiler for
  * those queries: a conjunction of triple patterns over (subj, pred, obj),
  * each term a variable or a constant, compiled into a chain of Catalyst
  * equi-joins — no interpreter, no driver-side row loop, so every pattern
  * query inherits predicate pushdown, broadcast planning and AQE exactly
  * like a hand-written join (W3C SPARQL 1.1 §5 BGP semantics, bag form,
  * evaluated over whatever edge multiset the caller passes — pass a
  * DISTINCT edge set for set semantics).
  *
  * Compilation:
  *   1. each pattern becomes a projection of the edge table: constant
  *      terms turn into filters (Catalyst pushes them into the scan),
  *      repeated variables WITHIN a pattern into equality filters
  *      (`?x p ?x` → subj = obj), and variable terms into columns named
  *      after the variable;
  *   2. patterns are joined greedily — most-constant pattern first (the
  *      most selective scan anchors the chain), then whichever remaining
  *      pattern shares the most variables with the bound set (ties: more
  *      constants, then input order) — every join is an equi-join on the
  *      shared variables, so there is never a cartesian product;
  *      a pattern sharing no variable with the rest is rejected
  *      (disconnected BGPs are almost always query bugs, and the
  *      cross-join they imply is a scale killer at a billion edges).
  *
  * Scale shape: k patterns = k scans of the edge table + (k-1) shuffles
  * on binding keys. Constant-predicate patterns prune to one predicate's
  * edges before any join; AQE broadcast-converts the small sides at
  * runtime. At a billion edges this is exactly the plan a SPARQL engine's
  * BGP optimizer (e.g. Jena's weighted-join reorder) would emit. When the
  * edge relation is itself an expensive derivation (an extraction stream,
  * not a stored table), checkpoint/cache it before calling — each pattern
  * scans the relation it is handed once.
  */
object BgpMatcher {

  /** A term of a triple pattern: a named variable or a string constant. */
  sealed trait Term
  final case class V(name: String) extends Term
  final case class C(value: String) extends Term

  /** One `subj pred obj` pattern of the conjunction. */
  final case class TriplePattern(s: Term, p: Term, o: Term) {
    def terms: Seq[(String, Term)] =
      Seq("subj" -> s, "pred" -> p, "obj" -> o)
    def vars: Seq[String] = terms.collect { case (_, V(n)) => n }.distinct
    def nConsts: Int = terms.count(_._2.isInstanceOf[C])
  }

  /** Compile one pattern to a relation whose columns are its variables. */
  private def compileOne(edges: DataFrame, pat: TriplePattern): DataFrame = {
    // constant terms and repeated in-pattern variables become filters
    val constFilter = pat.terms.collect {
      case (c, C(v)) => col(c) === lit(v)
    }
    val repeatFilter = pat.terms.collect { case (c, V(n)) => (n, c) }
      .groupBy(_._1).values.collect {
        case cols if cols.length > 1 =>
          cols.map(_._2).sliding(2).map { case Seq(a, b) => col(a) === col(b) }
      }.flatten
    val filtered = (constFilter ++ repeatFilter)
      .foldLeft(edges)((df, f) => df.filter(f))
    // project variable columns (first edge column wins for repeated vars)
    val proj: Seq[Column] = pat.terms.collect { case (c, V(n)) => (n, c) }
      .groupBy(_._1).map { case (n, cs) => col(cs.head._2).as(n) }.toSeq
    if (proj.isEmpty)
      // fully-constant pattern: an existence probe — one boolean column
      // per conjunct would change the schema, so keep a 1-row marker the
      // caller's join layer treats as a semi-join gate
      filtered.select(lit(1).as("__exists")).limit(1)
    else filtered.select(proj: _*)
  }

  /** Variable names a FILTER condition references — the unresolved
    * attributes of its column tree (filters are authored against the
    * BGP's variable columns, so every reference is a plain name). */
  private def refsOf(c: Column): Set[String] =
    GraftSqlBridge.referencedNames(c)

  /** Evaluate the conjunction of `patterns` over `edges` (columns subj,
    * pred, obj), then left-join each `optionals` pattern (SPARQL
    * `OPTIONAL { ... }` with a single triple pattern per group): rows
    * keep their required bindings and take NULL for an optional's fresh
    * variables when no edge matches. Each optional must share at least
    * one variable with the required patterns (its join key) and binds at
    * least one fresh variable (otherwise it would silently act as a
    * filter — SPARQL gives that the FILTER EXISTS spelling, so the
    * ambiguity is rejected here). Returns one row per binding of the
    * distinct variables in first-appearance order (required patterns
    * first, then optionals). Bag semantics over the input multiset.
    *
    * `filters` are SPARQL solution-level FILTER constraints (e.g.
    * `col("m") =!= col("y")`), each referencing only BGP variables. The
    * compiler PUSHES each filter to the earliest point of the join chain
    * where all its variables are bound — a selective inequality prunes
    * bindings before the later shuffles instead of after the full chain
    * (the FILTER-placement rewrite every SPARQL optimizer performs; at a
    * billion edges the difference is the size of every downstream
    * exchange). A filter naming an optional's variable runs after that
    * optional's left join and sees SQL NULL semantics for unmatched rows
    * (congruent with SPARQL's error-is-false for our string terms:
    * NULL <op> x is never TRUE, so unmatched rows are dropped — spell
    * `isNull`/`coalesce` explicitly to keep them).
    *
    * @throws IllegalArgumentException on an empty pattern list, a
    *         disconnected BGP (a pattern sharing no variable with the
    *         already-joined set), an invalid optional, or a filter
    *         referencing no variable / an unbound name. */
  def matchBgp(edges: DataFrame, patterns: Seq[TriplePattern],
               optionals: Seq[TriplePattern] = Nil,
               filters: Seq[Column] = Nil): DataFrame =
    matchBgpSources(patterns.map((_, edges)), optionals.map((_, edges)),
      filters)

  /** Vertical-partitioning form of [[matchBgp]]: each pattern reads its
    * OWN edge relation. Two callers need this generality: (a) a triple
    * store laid out per predicate (the classic SPARQL vertical
    * partitioning — each constant-predicate pattern scans only its own
    * table, no shared-scan filter needed), and (b) the SEMI-NAIVE delta
    * evaluation of [[constructDelta]], where the same pattern reads the
    * old, delta, or combined edge set depending on its position in the
    * delta expansion. Join order, filter placement and validation are
    * identical to [[matchBgp]] — the result is the conjunction of the
    * patterns regardless of which relation each one scans. */
  def matchBgpSources(patternSources: Seq[(TriplePattern, DataFrame)],
                      optionalSources: Seq[(TriplePattern, DataFrame)] = Nil,
                      filters: Seq[Column] = Nil): DataFrame = {
    val patterns = patternSources.map(_._1)
    val optionals = optionalSources.map(_._1)
    require(patterns.nonEmpty, "BGP needs at least one triple pattern")
    val outCols = (patterns ++ optionals).flatMap(_.vars).distinct
    require(patterns.exists(_.vars.nonEmpty),
      "BGP binds no variables — use a plain filter")
    var pending: Seq[(Column, Set[String])] = filters.map { f =>
      val refs = refsOf(f)
      require(refs.nonEmpty, s"FILTER $f references no BGP variable")
      val unknown = refs.diff(outCols.toSet)
      require(unknown.isEmpty,
        s"FILTER $f references unbound name(s): ${unknown.mkString(", ")}")
      (f, refs)
    }

    // anchor: most constants among the VARIABLE patterns (ties: input
    // order) — a fully-constant pattern binds nothing, so it can only be
    // a semi-join gate, never the chain anchor
    val anchor = patternSources.filter(_._1.vars.nonEmpty).maxBy(_._1.nConsts)
    var bound = anchor._1.vars.toSet
    var plan = compileOne(anchor._2, anchor._1)
    // earliest-placement FILTER pushdown: apply every pending filter
    // whose variables are all bound at this point of the chain
    def applyReadyFilters(): Unit = {
      val (ready, rest) = pending.partition(_._2.subsetOf(bound))
      ready.foreach { case (f, _) => plan = plan.filter(f) }
      pending = rest
    }
    applyReadyFilters()
    var todo = patternSources.diff(Seq(anchor))
    while (todo.nonEmpty) {
      val scored = todo.map { case (p, src) =>
        ((p, src), p.vars.count(bound.contains))
      }
      val ((next, src), shared) =
        scored.maxBy { case ((p, _), s) => (s, p.nConsts) }
      require(shared > 0 || next.vars.isEmpty,
        s"disconnected BGP: pattern $next shares no variable with ${bound.mkString(", ")}")
      val rel = compileOne(src, next)
      plan =
        if (next.vars.isEmpty) plan.join(rel, lit(true), "left_semi")
        else plan.join(rel, next.vars.filter(bound.contains))
      bound ++= next.vars
      applyReadyFilters()
      todo = todo.diff(Seq((next, src)))
    }
    // OPTIONAL groups: left-join in input order, each keyed on variables
    // already bound (by the required chain or an earlier optional)
    for ((opt, src) <- optionalSources) {
      val shared = opt.vars.filter(bound.contains)
      val fresh = opt.vars.filterNot(bound.contains)
      require(shared.nonEmpty,
        s"OPTIONAL pattern $opt shares no variable with the required patterns")
      require(fresh.nonEmpty,
        s"OPTIONAL pattern $opt binds no new variable — use a required pattern")
      plan = plan.join(compileOne(src, opt), shared, "left_outer")
      bound ++= fresh
      applyReadyFilters()
    }
    plan.select(outCols.map(col): _*)
  }

  /** One UNION branch: a required BGP plus its optionals and filters —
    * the operand shape of [[matchBgpUnion]]. */
  final case class Bgp(patterns: Seq[TriplePattern],
                       optionals: Seq[TriplePattern] = Nil,
                       filters: Seq[Column] = Nil)

  /** SPARQL `UNION` over BGP groups: evaluate each branch independently
    * ([[matchBgp]] — each keeps its own join order, filter placement and
    * optionals) and take the bag union of the solution sequences (SPARQL
    * 1.1 §18.5 Union). Branches may bind DIFFERENT variable sets; the
    * output schema is the distinct variables in first-appearance order
    * across branches, and a variable a branch does not bind is NULL in
    * that branch's rows (SPARQL's "unbound"). No cross-branch dedup —
    * UNION is bag semantics; wrap in `.distinct()` for set semantics.
    *
    * Scale shape: branches are independent subplans under one union —
    * Spark schedules their stages concurrently, and each branch's
    * constant-predicate scans prune independently. */
  def matchBgpUnion(edges: DataFrame, branches: Seq[Bgp]): DataFrame = {
    require(branches.nonEmpty, "UNION needs at least one branch")
    val outCols = branches
      .flatMap(b => (b.patterns ++ b.optionals).flatMap(_.vars)).distinct
    branches.map { b =>
      val m = matchBgp(edges, b.patterns, b.optionals, b.filters)
      val have = m.columns.toSet
      m.select(outCols.map(v =>
        if (have(v)) col(v) else lit(null).cast("string").as(v)): _*)
    }.reduce(_ unionByName _)
  }

  /** SPARQL `MINUS` (1.1 §18.5): drop every solution of `required` for
    * which `minus` has a COMPATIBLE solution — compatible = equal on the
    * shared variables. Compiled as one anti-join on the shared variable
    * columns: the subtrahend side never grows the output, so at a billion
    * edges this is the same co-partitioned anti-join shape as the
    * CONSTRUCT newOnly gate. Groups sharing NO variable are rejected:
    * SPARQL makes a domain-disjoint MINUS a no-op (keeps everything),
    * which in practice is a mis-typed variable name — the same stance
    * this compiler takes on disconnected BGPs. NULL bindings from an
    * OPTIONAL keep their row (NULL joins nothing), congruent with
    * SPARQL's unbound-variable compatibility: a solution whose shared
    * variable is unbound is only removable through its OTHER shared
    * bindings, and with a single unbound shared key nothing matches. */
  def matchBgpMinus(edges: DataFrame, required: Bgp, minus: Bgp): DataFrame = {
    val req = matchBgp(edges, required.patterns, required.optionals,
      required.filters)
    val sub = matchBgp(edges, minus.patterns, minus.optionals, minus.filters)
    val shared = req.columns.intersect(sub.columns).toSeq
    require(shared.nonEmpty,
      "MINUS group shares no variable with the required patterns — " +
        "SPARQL would keep every solution; spell the no-op explicitly")
    // the using-columns join fronts the key columns — restore the
    // required side's variable order (first-appearance, like matchBgp)
    req.join(sub.select(shared.map(col): _*), shared, "left_anti")
      .select(req.columns.map(col).toSeq: _*)
  }

  /** SPARQL `VALUES` (1.1 §10.2): join the solution sequence with an
    * INLINE binding table — the parameterized-query surface ("run this
    * pattern for THESE entities") and the idiom federated callers use to
    * ship a binding list into a remote pattern. Bag semantics: a
    * duplicated VALUES row duplicates its matching solutions, exactly as
    * the SPARQL multiset join does. Columns of `values` that the BGP
    * does not bind EXTEND each solution (the VALUES table may carry
    * payload columns); at least one column must be shared — a
    * domain-disjoint VALUES is the cartesian SPARQL technically permits
    * and this compiler rejects everywhere (the [[matchBgpMinus]] /
    * disconnected-BGP stance). Spark broadcasts the literal table by
    * size, so the join never shuffles the solution side on a small
    * binding list. */
  def withValues(solutions: DataFrame, values: DataFrame): DataFrame = {
    val shared = solutions.columns.intersect(values.columns).toSeq
    require(shared.nonEmpty,
      "VALUES shares no variable with the solutions — the implied " +
        "cartesian product is rejected; join explicitly if intended")
    solutions.join(values, shared)
      .select((solutions.columns ++
        values.columns.filterNot(shared.contains)).map(col).toSeq: _*)
  }

  /** SPARQL CONSTRUCT with a single head pattern — the RULE APPLICATION
    * step of KG completion: evaluate the `body` BGP, instantiate `head`
    * once per distinct binding, and (with `newOnly`, the default) keep
    * only triples NOT already in the graph — exactly how a mined Horn
    * rule (e.g. from the AMIE-style miner) materializes its inferred
    * edges. Head variables must be bound by the body (an unbound head
    * variable would construct blank nodes — out of scope, rejected).
    *
    * Scale shape: the body join chain (see [[matchBgp]]) + one distinct
    * + one anti-join co-partitioned on the full triple key.
    *
    * @return DataFrame(subj, pred, obj) of constructed triples. */
  def construct(edges: DataFrame, body: Seq[TriplePattern],
                head: TriplePattern, newOnly: Boolean = true): DataFrame = {
    val bound = body.flatMap(_.vars).toSet
    val missing = head.vars.filterNot(bound.contains)
    require(missing.isEmpty,
      s"head variables ${missing.mkString(", ")} are not bound by the body")
    val bindings = matchBgp(edges, body)
    def term(t: Term): Column = t match {
      case V(n) => col(n)
      case C(v) => lit(v)
    }
    val derived = bindings.select(term(head.s).as("subj"),
      term(head.p).as("pred"), term(head.o).as("obj")).distinct()
    if (newOnly)
      derived.join(edges.select(col("subj"), col("pred"), col("obj")),
        Seq("subj", "pred", "obj"), "left_anti")
    else derived
  }

  /** SEMI-NAIVE incremental maintenance of [[construct]] — the datalog
    * delta-rule evaluation (the [[graft.operators.Dedup.keepListDelta]] /
    * KgRollupStore theorem applied to reasoning): when a corpus delta
    * adds `deltaEdges` to a graph whose previous CONSTRUCT heads were
    * STORED (`oldDerived` = yesterday's `construct(old, body, head,
    * newOnly = false)` — production persists it beside the rollup, the
    * way KgRollupStore persists edge counts), the new inferred set is
    * maintained WITHOUT re-grounding the old graph against itself.
    *
    * Delta expansion: for an n-pattern body, Δ(B₁ ⋈ … ⋈ Bₙ) =
    * ⋃ᵢ (B'₁ ⋈ … ⋈ B'ᵢ₋₁ ⋈ ΔBᵢ ⋈ Bᵢ₊₁ ⋈ … ⋈ Bₙ) with B' = old ∪ Δ —
    * every new grounding uses at least one delta edge, in exactly one
    * branch (the standard semi-naive rewrite; naive re-evaluation grounds
    * old×old every run, which at a billion edges is the whole join cost
    * repeated per delta). Each branch is one [[matchBgpSources]] call:
    * pattern i reads the delta, earlier patterns the combined set, later
    * ones the old set. New heads union the stored ones, then one
    * anti-join against the combined edge set (a previously-inferred edge
    * the delta ASSERTS leaves the inferred set — observation beats
    * inference) — so the result provably equals
    * `construct(old ∪ delta, body, head)` while the quadratic grounding
    * work is delta-restricted.
    *
    * Both inputs may overlap (re-delivered edges dedup in the head
    * distinct); `oldDerived` must carry (subj, pred, obj).
    *
    * @return DataFrame(subj, pred, obj), == `construct(old ∪ delta)`. */
  def constructDelta(oldEdges: DataFrame, deltaEdges: DataFrame,
                     oldDerived: DataFrame, body: Seq[TriplePattern],
                     head: TriplePattern,
                     newOnly: Boolean = true): DataFrame = {
    val bound = body.flatMap(_.vars).toSet
    val missing = head.vars.filterNot(bound.contains)
    require(missing.isEmpty,
      s"head variables ${missing.mkString(", ")} are not bound by the body")
    val triple = Seq("subj", "pred", "obj")
    def edgesOf(df: DataFrame) = df.select(triple.map(col): _*)
    val old = edgesOf(oldEdges)
    val delta = edgesOf(deltaEdges)
    val full = old.unionByName(delta)
    def term(t: Term): Column = t match {
      case V(n) => col(n)
      case C(v) => lit(v)
    }
    val headCols = Seq(term(head.s).as("subj"), term(head.p).as("pred"),
      term(head.o).as("obj"))
    val deltaDerived = body.indices.map { i =>
      val sources = body.zipWithIndex.map { case (p, j) =>
        (p, if (j < i) full else if (j == i) delta else old)
      }
      matchBgpSources(sources).select(headCols: _*)
    }.reduce(_ unionByName _)
    val derived = edgesOf(oldDerived).unionByName(deltaDerived).distinct()
    if (newOnly) derived.join(full, triple, "left_anti") else derived
  }

}
