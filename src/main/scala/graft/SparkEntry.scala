package graft

import graft.core._
import graft.score.LexiconScorer
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` double as the operator inventory demo: TPC-H-style relational
  * coverage (F/J/A/W/X rows of SURVEY.md §2), the training-data-pipeline
  * operators (dedup / simsearch / text analysis / multimodal), and the KG
  * pipeline itself. Every oracle-checked entry aliases columns identically
  * on both sides and avoids cross-engine float hazards (see Queries).
  */
object SparkEntry {

  /** Flagship: the full KG-construction pipeline (mention detection →
    * pair generation → window encoding → lexicon scoring → canonicalization
    * → triples) on a deterministic synthetic corpus. Driver smoke-checks
    * rows > 0 — guaranteed: the generator plants positives. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val p = CorpusGen.Params(nDocs = 200)
    val gen = CorpusGen.generate(spark, p)
    val docs = CorpusGen.docs(gen)
    val edges = spark.createDataset(CorpusGen.equivEdges(p))
    KgPipeline.run(docs, CorpusGen.dictionary(p), edges, LexiconScorer.default)
      .triples.toDF()
  }

  /** One entry per implemented operator (SURVEY.md §2 + curation ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational / TPC-H coverage
    "q1_agg" -> (Queries.q1Agg _),
    "q2_broadcast_join" -> (Queries.q2BroadcastJoin _),
    "q3_join_topk" -> (Queries.q3JoinTopK _),
    "q4_semi_join" -> (Queries.q4SemiJoin _),
    "q5_anti_join" -> (Queries.q5AntiJoin _),
    "q6_window" -> (Queries.q6Window _),
    "q7_setop" -> (Queries.q7SetOp _),
    "q8_distinct_agg" -> (Queries.q8DistinctAgg _),
    "q9_filter_pushdown" -> (Queries.q9FilterPushdown _),
    // events / time
    "q10_events_window" -> (Queries.q10EventsWindow _),
    "q11_sessionize" -> (Queries.q11Sessionize _),
    "q12_conditional_agg" -> (Queries.q12ConditionalAgg _),
    "q13_streaming" -> (Queries.q13Streaming _),
    "q14_session_window" -> (Queries.q14SessionWindow _),
    "events_asof" -> (Queries.eventsAsof _),
    "events_range_join" -> (Queries.eventsRangeJoin _),
    // deduplication suite
    "dedup_exact" -> (Queries.dedupExact _),
    "dedup_ngram_jaccard" -> (Queries.dedupNgramJaccard _),
    "dedup_minhash_lsh" -> (Queries.dedupMinhashLsh _),
    "dedup_lsh_verified" -> (Queries.dedupLshVerified _),
    "dedup_simhash" -> (Queries.dedupSimhash _),
    "dedup_keep_list" -> (Queries.dedupKeepList _),
    "dedup_cluster_sizes" -> (Queries.dedupClusterSizes _),
    "dedup_keep_list_semantic" -> (Queries.dedupKeepListSemantic _),
    "dedup_keep_list_delta" -> (Queries.dedupKeepListDelta _),
    "dedup_embedding_grid" -> (Queries.dedupEmbeddingGrid _),
    "dedup_embedding_cosine" -> (Queries.dedupEmbeddingCosine _),
    // similarity search
    "simsearch_qdot" -> (Queries.simsearchQdot _),
    "simsearch_cosine" -> (Queries.simsearchCosine _),
    "simsearch_lsh" -> (Queries.simsearchLsh _),
    "simsearch_ivf" -> (Queries.simsearchIvf _),
    // text analysis
    "text_tokencount" -> (Queries.textTokenCount _),
    "text_quality" -> (Queries.textQuality _),
    "text_langid" -> (Queries.textLangId _),
    "text_fingerprint" -> (Queries.textFingerprint _),
    "text_decontam" -> (Queries.textDecontam _),
    "text_decontam_bloom" -> (Queries.textDecontamBloom _),
    "text_sample" -> (Queries.textSample _),
    "text_sample_topk" -> (Queries.textSampleTopK _),
    "text_repetition" -> (Queries.textRepetition _),
    "text_keyterms" -> (Queries.textKeyTerms _),
    "text_pack" -> (Queries.textPack _),
    "text_pack_chunks" -> (Queries.textPackChunks _),
    "text_gopher" -> (Queries.textGopher _),
    "text_line_dedup" -> (Queries.textLineDedup _),
    "text_pii" -> (Queries.textPii _),
    "text_url_flags" -> (Queries.textUrlFlags _),
    "text_dup_passages" -> (Queries.textDupPassages _),
    "text_passage_clean" -> (Queries.textPassageClean _),
    "text_mixture" -> (Queries.textMixture _),
    "text_mixture_weighted" -> (Queries.textMixtureWeighted _),
    "text_classifier" -> (Queries.textClassifier _),
    "text_cms_counts" -> (Queries.textCmsCounts _),
    "text_kmv_distinct" -> (Queries.textKmvDistinct _),
    "text_sample_weighted" -> (Queries.textSampleWeighted _),
    "corpus_stats" -> (Queries.corpusStats _),
    "corpus_overlap" -> (Queries.corpusOverlap _),
    "corpus_audit" -> (Queries.corpusAudit _),
    "corpus_drift" -> (Queries.corpusDrift _),
    // the end-to-end composition: keep-list → decontam → quality →
    // sample → pack, one bit-exact oracle
    "curation_pipeline" -> (Queries.curationPipeline _),
    // KG construction over the driver tables
    "kg_mentions" -> (Queries.kgMentions _),
    "kg_cooccur_pairs" -> (Queries.kgCooccurPairs _),
    "kg_triples" -> (Queries.kgTriples _),
    "kg_edge_rollup" -> (Queries.kgEdgeRollup _),
    "kg_node_degrees" -> (Queries.kgNodeDegrees _),
    "kg_pagerank" -> (Queries.kgPageRank _),
    "kg_components" -> (Queries.kgComponents _),
    "kg_triangles" -> (Queries.kgTriangles _),
    "kg_node_sim" -> (Queries.kgNodeSim _),
    "kg_khop" -> (Queries.kgKhop _),
    "kg_communities" -> (Queries.kgCommunities _),
    "kg_entity_merge" -> (Queries.kgEntityMerge _),
    "kg_er_candidates" -> (Queries.kgErCandidates _),
    "kg_edge_rollup_delta" -> (Queries.kgEdgeRollupDelta _),
    "kg_stream_edges" -> (Queries.kgStreamEdges _),
    "kg_lift" -> (Queries.kgLift _),
    // user co-occurrence graph (events): peel / link-predict / PPR
    "user_kcore" -> (Queries.userKcore _),
    "user_betweenness" -> (Queries.userBetweenness _),
    "user_nf" -> (Queries.userNf _),
    "user_mis" -> (Queries.userMis _),
    "user_truss" -> (Queries.userTruss _),
    "user_wl_colors" -> (Queries.userWlColors _),
    "user_modularity" -> (Queries.userModularity _),
    "user_linkpred" -> (Queries.userLinkPredict _),
    "user_ppr" -> (Queries.userPpr _),
    "user_sssp" -> (Queries.userSssp _),
    "user_graph_stats" -> (Queries.userGraphStats _),
    "user_harmonic" -> (Queries.userHarmonic _),
    "user_walks" -> (Queries.userWalks _),
    "user_walk_pairs" -> (Queries.userWalkPairs _),
    "user_walks_biased" -> (Queries.userWalksBiased _),
    "user_temporal_reach" -> (Queries.userTemporalReach _),
    "kg_pipeline_triples" -> (Queries.kgPipelineTriples _),
    "kg_nodes" -> (Queries.kgNodes _),
    // KG schema induction over typed predicates + export/negatives
    "kg_typed_triples" -> (Queries.kgTypedTriples _),
    "kg_pred_stats" -> (Queries.kgPredicateStats _),
    "kg_metapaths" -> (Queries.kgMetapaths _),
    "kg_negatives" -> (Queries.kgNegatives _),
    "kg_ntriples" -> (Queries.kgNtriples _),
    "kg_provenance" -> (Queries.kgProvenance _),
    "kg_rules" -> (Queries.kgRules _),
    "kg_rules_inverse" -> (Queries.kgRulesInverse _),
    "kg_bgp" -> (Queries.kgBgp _),
    "kg_bgp_optional" -> (Queries.kgBgpOptional _),
    "kg_bgp_filter" -> (Queries.kgBgpFilter _),
    "kg_bgp_union" -> (Queries.kgBgpUnion _),
    "kg_bgp_minus" -> (Queries.kgBgpMinus _),
    "kg_bgp_values" -> (Queries.kgBgpValues _),
    "kg_rule_infer" -> (Queries.kgRuleInfer _),
    "kg_rule_infer_delta" -> (Queries.kgRuleInferDelta _),
    "kg_rule_apply" -> (Queries.kgRuleApply _),
    "kg_completion_eval" -> (Queries.kgCompletionEval _),
    "kg_path_closure" -> (Queries.kgPathClosure _),
    "kg_inferred_types" -> (Queries.kgInferredTypes _),
    "kg_schema_viol" -> (Queries.kgSchemaViolations _),
    "kg_edge_diff" -> (Queries.kgEdgeDiff _),
    // multimodal plumbing
    "multimodal_features" -> (Queries.multimodalFeatures _),
    "multimodal_audio" -> (Queries.multimodalAudio _),
  )

  // ------- generated oracle SQL for the portable-hash operator family -----
  // Every hash below is integer LCG arithmetic over dense token ids (see
  // Dedup "portable" scaladoc), so DuckDB reproduces the Spark results
  // value-for-value — candidate sets included. The SQL is generated, not
  // hand-maintained, so constants can never drift from the Scala side.

  private val P = graft.operators.Dedup.HashP

  /** Decontamination oracle, mirroring Dedup.decontaminate branch for
    * branch: 8-grams both sides for docs ≥ 8 words; sub-8-word docs match
    * by whole-doc containment (windows generated at exactly the short
    * lengths present on the other side). eval = doc_id % 5 == 0. Shared
    * verbatim by text_decontam and text_decontam_bloom — one oracle, two
    * physical plans. */
  private val decontamSql: String =
    """WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      | ev AS (SELECT doc_id AS eval_id, ws FROM d WHERE doc_id % 5 = 0),
      | co AS (SELECT doc_id, ws FROM d WHERE doc_id % 5 <> 0),
      | cog AS (SELECT doc_id, unnest(list_distinct(list_filter(list_transform(ws, (x,i) ->
      |     CASE WHEN i+7 <= len(ws) THEN array_to_string(list_slice(ws, i, i+7), ' ') END),
      |     s -> s IS NOT NULL))) AS g FROM co WHERE len(ws) >= 8),
      | evg AS (SELECT eval_id, unnest(list_distinct(list_filter(list_transform(ws, (x,i) ->
      |     CASE WHEN i+7 <= len(ws) THEN array_to_string(list_slice(ws, i, i+7), ' ') END),
      |     s -> s IS NOT NULL))) AS g FROM ev WHERE len(ws) >= 8),
      | m1 AS (SELECT doc_id, eval_id, g FROM cog JOIN evg USING (g)),
      | evs AS (SELECT eval_id, array_to_string(ws,' ') AS g, len(ws) AS l
      |         FROM ev WHERE len(ws) < 8),
      | evl AS (SELECT DISTINCT l FROM evs),
      | cosw AS (SELECT doc_id, unnest(list_distinct(list_filter(list_transform(ws, (x,i) ->
      |     CASE WHEN i+evl.l-1 <= len(ws) THEN array_to_string(list_slice(ws, i, i+evl.l-1), ' ') END),
      |     s -> s IS NOT NULL))) AS g FROM co CROSS JOIN evl WHERE len(ws) >= evl.l),
      | m2 AS (SELECT doc_id, eval_id, cosw.g FROM cosw JOIN evs ON cosw.g = evs.g),
      | co_s AS (SELECT doc_id, array_to_string(ws,' ') AS g FROM co WHERE len(ws) < 8),
      | co_l AS (SELECT DISTINCT len(ws) AS l FROM co WHERE len(ws) < 8),
      | evgw AS (SELECT eval_id, unnest(list_distinct(list_filter(list_transform(ws, (x,i) ->
      |     CASE WHEN i+co_l.l-1 <= len(ws) THEN array_to_string(list_slice(ws, i, i+co_l.l-1), ' ') END),
      |     s -> s IS NOT NULL))) AS g FROM ev CROSS JOIN co_l WHERE len(ws) >= co_l.l),
      | m3 AS (SELECT doc_id, eval_id, co_s.g FROM co_s JOIN evgw ON co_s.g = evgw.g),
      | allm AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3)
      |SELECT doc_id, count(DISTINCT eval_id) AS n_eval_docs,
      |  count(DISTINCT g) AS n_shared_ngrams
      |FROM allm GROUP BY doc_id""".stripMargin

  /** kg_triples oracle body — also the inner query of kg_edge_rollup's. */
  /** Shared CTE prelude for the user co-occurrence graph oracles —
    * distinct (user, minute) buckets self-joined, then symmetrized; the
    * minute key is exact integer micros // 60e6, matching the engine's
    * `unix_micros(ts) div 60000000` ([[graft.Queries.userGraphEdges]]).
    * Every CTE is MATERIALIZED: the iterative oracles below reference
    * them many times and DuckDB would otherwise inline the chain
    * exponentially. */
  private val userSymSql: String =
    """b AS MATERIALIZED (SELECT DISTINCT user_id,
      |   epoch_us(ts) // 60000000 AS bkt FROM events),
      | e0 AS MATERIALIZED (SELECT DISTINCT x.user_id AS src, y.user_id AS dst
      |   FROM b x JOIN b y ON x.bkt = y.bkt AND x.user_id < y.user_id),
      | sym AS MATERIALIZED (SELECT src, dst FROM e0
      |   UNION SELECT dst, src FROM e0)""".stripMargin

  /** Walk-corpus CTE chain: unrolls the engine's per-step LCG argmin —
    * `walks` holds every (start, walk, step, node) row of the corpus.
    * CASTs keep DuckDB's int32 literals from overflowing mid-product. */
  private val userWalksSql: String = {
    val steps = (1 to Queries.WalkLength).map { i =>
      s""" s$i AS MATERIALIZED (SELECT start, walk, $i AS step, node FROM (
         |   SELECT f.start, f.walk, sym.dst AS node,
         |     row_number() OVER (PARTITION BY f.start, f.walk ORDER BY
         |       ((CAST(f.start AS BIGINT) % 2147483647) * 1103515245
         |          % 2147483647
         |        + f.walk * 12345 + $i * 97003
         |        + (CAST(sym.dst AS BIGINT) % 2147483647) *
         |          ${(2654435761L + java.lang.Math.floorMod(Queries.WalkSeed, 65536L) * 32452843L) % 2147483647L}
         |          % 2147483647
         |       ) % 2147483647, sym.dst) AS rn
         |   FROM s${i - 1} f JOIN sym ON sym.src = f.node) WHERE rn = 1)"""
        .stripMargin
    }.mkString(",\n")
    val walkVals = (0 until Queries.WalksPerNode)
      .map(i => s"($i)").mkString(", ")
    val union = (0 to Queries.WalkLength)
      .map(i => s"SELECT start, walk, step, node FROM s$i")
      .mkString("\n   UNION ALL ")
    s"""$userSymSql,
       | s0 AS MATERIALIZED (SELECT src AS start, walk, 0 AS step,
       |     src AS node
       |   FROM (SELECT DISTINCT src FROM sym)
       |   CROSS JOIN (VALUES $walkVals) t(walk)),
       |$steps,
       | walks AS MATERIALIZED ($union)""".stripMargin
  }

  /** Biased (node2vec) walk-corpus CTE chain: each step re-derives the
    * engine's hash-div-weight argmin, including the previous-node
    * adjacency probe (LEFT JOIN against sym) that classifies every
    * candidate as return / in-neighborhood / forward. */
  private val userWalksBiasedSql: String = {
    val mult =
      (2654435761L + java.lang.Math.floorMod(Queries.WalkSeed, 65536L) *
        32452843L) % 2147483647L
    val steps = (1 to Queries.WalkLength).map { i =>
      s""" c$i AS (SELECT f.start, f.walk, sym.dst, f.node AS nxt_prev,
         |     ((CAST(f.start AS BIGINT) % 2147483647) * 1103515245
         |        % 2147483647
         |      + f.walk * 12345 + $i * 97003
         |      + (CAST(sym.dst AS BIGINT) % 2147483647) * $mult
         |        % 2147483647) % 2147483647 AS hh,
         |     CASE WHEN f.prev IS NULL THEN 1000
         |          WHEN sym.dst = f.prev THEN ${Queries.WalkRetPermille}
         |          WHEN a.dst IS NOT NULL THEN ${Queries.WalkInPermille}
         |          ELSE ${Queries.WalkOutPermille} END AS w
         |   FROM b$i f JOIN sym ON sym.src = f.node
         |   LEFT JOIN sym a ON a.src = f.prev AND a.dst = sym.dst),
         | b${i + 1} AS MATERIALIZED (SELECT start, walk, $i AS step,
         |     dst AS node, nxt_prev AS prev
         |   FROM (SELECT *, row_number() OVER (PARTITION BY start, walk
         |       ORDER BY hh // w, dst) AS rn FROM c$i) WHERE rn = 1)"""
        .stripMargin
    }.mkString(",\n")
    val walkVals = (0 until Queries.WalksPerNode)
      .map(i => s"($i)").mkString(", ")
    val union = (1 to Queries.WalkLength + 1)
      .map(i => s"SELECT start, walk, step, node FROM b$i")
      .mkString("\n   UNION ALL ")
    s"""$userSymSql,
       | b1 AS MATERIALIZED (SELECT src AS start, walk, 0 AS step,
       |     src AS node, CAST(NULL AS BIGINT) AS prev
       |   FROM (SELECT DISTINCT src FROM sym)
       |   CROSS JOIN (VALUES $walkVals) t(walk)),
       |$steps,
       | bwalks AS MATERIALIZED ($union)""".stripMargin
  }

  private def kgTriplesSql: String = {
    def has(w: String) =
      s"(length(text) - length(replace(text, '$w', ''))) / ${w.length} > 0"
    val trig = Queries.kgTriggerWords.map(has).mkString("(", " OR ", ")")
    val ws = Queries.kgDictWords
    val branches = for {
      i <- ws.indices; j <- (i + 1) until ws.length
    } yield
      s"""SELECT doc_id, '${ws(i)}' AS subj, 'co_complex' AS pred, '${ws(j)}' AS obj
         |FROM documents WHERE ${has(ws(i))} AND ${has(ws(j))} AND $trig""".stripMargin
    branches.mkString("\nUNION ALL\n")
  }

  /** CTE chain ending in `t(doc_id, subj, pred, obj)` — the TYPED triple
    * extraction ([[graft.Queries.kgTypedTriplesOf]]): one flag CTE over the
    * documents table (the SQL mirror of the engine's single-scan flag
    * projection), then the C(5,2)·|preds| branch union reading only the
    * flags. Shared by the schema-induction oracles. */
  private def kgTypedCtes: String = {
    def has(w: String) =
      s"(length(text) - length(replace(text, '$w', ''))) / ${w.length} > 0"
    val ws = Queries.kgDictWords
    val flags = (ws ++ Queries.kgPredWords).distinct
      .map(w => s"${has(w)} AS has_$w").mkString(",\n    ")
    val branches = for {
      i <- ws.indices; j <- (i + 1) until ws.length
      p <- Queries.kgPredWords
    } yield s"SELECT doc_id, '${ws(i)}' AS subj, '$p' AS pred, " +
      s"'${ws(j)}' AS obj FROM tf WHERE has_${ws(i)} AND has_${ws(j)} AND has_$p"
    s"""tf AS MATERIALIZED (SELECT doc_id,
       |    $flags FROM documents),
       | t AS MATERIALIZED (${branches.mkString("\nUNION ALL\n")})""".stripMargin
  }

  /** `CASE <col> WHEN 'filter' THEN 0 ... END` — predicate-lexicon rank,
    * the [[dictRankSql]] twin over [[graft.Queries.kgPredWords]]. */
  private def predRankSql(c: String): String =
    s"CASE $c " + Queries.kgPredWords.zipWithIndex.map { case (w, i) =>
      s"WHEN '$w' THEN $i" }.mkString(" ") + " END"

  /** The completion entries' deterministic edge-split code — the SQL
    * mirror of `Queries.edgeSplitCode` (subj rank·25 + pred rank·5 +
    * obj rank; held out when ≡ 3 mod 4). */
  private def edgeSplitSql: String =
    s"(${dictRankSql("subj")}) * 25 + (${predRankSql("pred")}) * 5 + " +
      s"(${dictRankSql("obj")})"

  /** CTE chain `chain → rp → np → cl → rules → predicted` mirroring
    * [[graft.graph.GraphOps.applyMinedRules]] over the edge CTE `ec`:
    * chain-2 groundings, the kg_rules mining rollup, the gate (the SAME
    * Scala constants the engine uses), and the per-predicted-edge
    * max-confidence dedup. Ends without a trailing comma. */
  private def minedRuleCtes(ec: String): String =
    s""" chain AS MATERIALIZED (SELECT a.pred AS pred_a, b.pred AS pred_b,
       |   a.subj AS x, b.obj AS y FROM $ec a JOIN $ec b ON b.subj = a.obj),
       | rp AS MATERIALIZED (SELECT DISTINCT pred_a, pred_b, x, y
       |   FROM chain),
       | np AS (SELECT pred_a, pred_b, count(*) AS n_pairs FROM rp
       |   GROUP BY 1, 2),
       | cl AS (SELECT p.pred_a, p.pred_b, h.pred AS pred_head,
       |   count(*) AS n_closed FROM rp p
       |   JOIN $ec h ON h.subj = p.x AND h.obj = p.y GROUP BY 1, 2, 3),
       | rules AS (SELECT pred_a, pred_b, pred_head,
       |     (n_closed * 1000) // n_pairs AS conf_permille
       |   FROM cl JOIN np USING (pred_a, pred_b)
       |   WHERE (n_closed * 1000) // n_pairs >=
       |       ${Queries.RuleConfGatePermille}
       |     AND n_pairs >= ${Queries.RuleMinPairs}),
       | predicted AS (SELECT c.x AS subj, r.pred_head AS pred,
       |     c.y AS obj, max(r.conf_permille) AS conf_permille
       |   FROM chain c JOIN rules r USING (pred_a, pred_b)
       |   GROUP BY 1, 2, 3)""".stripMargin

  /** `CASE <col> WHEN 'customer' THEN 'biz' ... END` — the SQL mirror of
    * the engine's entity-type when-chain, generated from the same map. */
  private def entityTypeSql(c: String): String =
    s"CASE $c " + Queries.kgDictWords.map(w =>
      s"WHEN '$w' THEN '${Queries.kgEntityTypes(w)}'").mkString(" ") + " END"

  /** `CASE <col> WHEN 'customer' THEN 0 ... END` — dictionary rank. */
  private def dictRankSql(c: String): String =
    s"CASE $c " + Queries.kgDictWords.zipWithIndex.map { case (w, i) =>
      s"WHEN '$w' THEN $i" }.mkString(" ") + " END"

  /** CTE chain ending in `iv(doc_id, start_tok, end_tok, n_grams)` — the
    * repeated-passage interval construction shared by text_dup_passages
    * and text_passage_clean: positioned k-grams → cross-doc census →
    * gaps-and-islands merge (frames identical in both engines). */
  private def dupPassageCtes: String = {
    val k = Queries.PassageK; val km1 = k - 1
    s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
       |   WHERE text IS NOT NULL AND doc_id IS NOT NULL),
       | g AS (SELECT doc_id, unnest(range(0, len(ws)-$km1)) AS pos,
       |    unnest(list_transform(range(0, len(ws)-$km1),
       |      i -> array_to_string(list_slice(ws, i+1, i+$k), ' '))) AS gr FROM d),
       | dup AS (SELECT gr FROM (SELECT gr, count(DISTINCT doc_id) AS nd
       |         FROM g GROUP BY gr) x WHERE nd >= 2),
       | m AS (SELECT doc_id, pos FROM g JOIN dup USING (gr)),
       | i1 AS (SELECT doc_id, pos, CASE WHEN pos > COALESCE(max(pos+$k) OVER
       |    (PARTITION BY doc_id ORDER BY pos
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |    THEN 1 ELSE 0 END AS ni FROM m),
       | i2 AS (SELECT doc_id, pos, sum(ni) OVER
       |    (PARTITION BY doc_id ORDER BY pos) AS island FROM i1),
       | iv AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_tok,
       |    CAST(max(pos)+$k AS BIGINT) AS end_tok,
       |    CAST(count(*) AS BIGINT) AS n_grams
       |   FROM i2 GROUP BY doc_id, island)""".stripMargin
  }

  /** CTE chain ending in `cand(doc_a, doc_b)` — the portable MinHash-LSH
    * candidate construction (3-gram shingles, k=16, 4 bands × 4 rows).
    * `src` is the corpus relation (default the full documents table; the
    * curation oracle passes its %5≠0 corpus slice as a subquery). */
  private def minhashCandCtes(src: String = "documents"): String = {
    import graft.operators.Dedup.{HashA, HashB}
    val mins = (0 until 16).map(s =>
      s"min((${HashA(s)}*tid + ${HashB(s)}) % $P) AS h$s").mkString(", ")
    val bandSel = (0 until 4).map { b =>
      val fold = (0 until 4).map(r => s"h${b * 4 + r}")
        .reduce((acc, h) => s"($acc*1009+$h)")
      s"SELECT doc_id, $b AS band, $fold AS bucket FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH d AS (SELECT doc_id, text, string_split(text,' ') AS ws FROM $src AS src0),
       | shx AS (SELECT doc_id, unnest(CASE WHEN len(ws) < 3 THEN [text]
       |   ELSE list_distinct(list_filter(list_transform(ws, (x,i) ->
       |     CASE WHEN i+2 <= len(ws) THEN array_to_string(list_slice(ws, i, i+2), ' ') END),
       |     s -> s IS NOT NULL)) END) AS sh FROM d),
       | vocab AS (SELECT sh, row_number() OVER (ORDER BY sh) AS tid
       |           FROM (SELECT DISTINCT sh FROM shx)),
       | t AS (SELECT doc_id, tid FROM shx JOIN vocab USING (sh)),
       | sig AS (SELECT doc_id, $mins FROM t GROUP BY doc_id),
       | bands AS ($bandSel),
       | cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |   FROM bands a JOIN bands b
       |   ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |   GROUP BY 1, 2)""".stripMargin
  }

  /** minhashCandCtes extended with the exact word-Jaccard verification —
    * ends in `verif(doc_a, doc_b, n_common, n_a, n_b)`, shared by
    * dedup_lsh_verified and dedup_keep_list. */
  private def lshVerifiedCtes(src: String = "documents",
                              pct: Int = 80): String =
    minhashCandCtes(src) +
      s""",
        | wset AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w
        |   FROM $src AS src1),
        | sizes AS (SELECT doc_id, count(*) AS n FROM wset GROUP BY doc_id),
        | comm AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common FROM cand c
        |   JOIN wset a ON a.doc_id = c.doc_a
        |   JOIN wset b ON b.doc_id = c.doc_b AND b.w = a.w
        |   GROUP BY 1, 2),
        | verif AS (SELECT comm.doc_a, comm.doc_b, CAST(n_common AS BIGINT) AS n_common,
        |   CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
        |  FROM comm JOIN sizes sa ON comm.doc_a = sa.doc_id
        |   JOIN sizes sb ON comm.doc_b = sb.doc_id
        |  WHERE n_common * ${100 + pct} >= $pct * (sa.n + sb.n))""".stripMargin

  private def simhashSqlGen: String = {
    import graft.operators.Dedup.{HashA, HashB}
    val bitSums = (0 until 64).map(i =>
      s"sum(CASE WHEN ((${HashA(i)}*tid + ${HashB(i)}) % $P) * 2 < $P" +
        s" THEN 1 ELSE -1 END) AS b$i").mkString(", ")
    val combine = (0 until 64).map(i =>
      s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    s"""WITH wset AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS sh
       |   FROM documents),
       | vocab AS (SELECT sh, row_number() OVER (ORDER BY sh) AS tid
       |           FROM (SELECT DISTINCT sh FROM wset)),
       | t AS (SELECT doc_id, tid FROM wset JOIN vocab USING (sh)),
       | bits AS (SELECT doc_id, $bitSums FROM t GROUP BY doc_id),
       | shh AS (SELECT doc_id, CAST($combine AS BIGINT) AS sh FROM bits),
       | keyed AS (SELECT doc_id, sh, blk, (sh >> CAST(blk*16 AS INTEGER)) & 65535 AS key
       |           FROM (SELECT doc_id, sh, unnest(range(0,4)) AS blk FROM shh))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
       |FROM keyed a JOIN keyed b
       |  ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin
  }

  /** The keep-list closure CTE chain (ending in `comp(doc, keep)`):
    * exact-dup edges ∪ verified near-dup pairs (∪ the semantic cosine-pair
    * edges when `withSemantic`), closed transitively by a recursive
    * min-label CTE (== the engine's connected components; numeric min ==
    * the %020d-padded string min for non-negative ids). The semantic edge
    * CTEs are the dedup_embedding_cosine construction verbatim (integer
    * cross-multiply threshold), renamed s* to avoid CTE-name clashes.
    * Shared by the two keep-list oracles and the curation-pipeline
    * composition. */
  private def keepListCtes(withSemantic: Boolean,
                           src: String = "documents",
                           pct: Int = 80): String = {
    val semCtes = if (!withSemantic) "" else
      "," + quantVCte.stripPrefix("WITH") + "," + planeWgtCte(6) +
        """,
          | sdots AS (SELECT v.vec_id, w.b, sum(v.qx*w.wgt) AS d
          |          FROM v JOIN w ON v.i = w.i GROUP BY 1, 2),
          | sbuck AS (SELECT vec_id,
          |     CAST(sum(CASE WHEN d > 0 THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
          |   FROM sdots GROUP BY 1),
          | spairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          |   FROM sbuck a JOIN sbuck b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
          | sdotp AS (SELECT vec_a, vec_b, CAST(sum(x.qx*y.qx) AS BIGINT) AS qdot
          |   FROM spairs JOIN v x ON x.vec_id = vec_a
          |   JOIN v y ON y.vec_id = vec_b AND y.i = x.i
          |   GROUP BY 1, 2),
          | snorms AS (SELECT vec_id, CAST(sum(qx*qx) AS BIGINT) AS n FROM v GROUP BY 1),
          | sem AS (SELECT vec_a AS a, vec_b AS b FROM sdotp
          |   JOIN snorms na ON vec_a = na.vec_id
          |   JOIN snorms nb ON vec_b = nb.vec_id
          |   WHERE qdot > 0 AND 400*qdot*qdot >= 9*na.n*nb.n)""".stripMargin
    val semUnion = if (withSemantic) " UNION SELECT a, b FROM sem" else ""
    "WITH RECURSIVE" + lshVerifiedCtes(src, pct).stripPrefix("WITH") + semCtes +
      s""",
         | exg AS (SELECT md5(text) AS h, min(doc_id) AS m FROM $src AS src2 GROUP BY 1),
         | ex AS (SELECT d.doc_id AS a, g.m AS b FROM $src AS d
         |        JOIN exg g ON md5(d.text) = g.h WHERE d.doc_id <> g.m),
         | ed AS (SELECT a, b FROM ex UNION
         |        SELECT doc_a AS a, doc_b AS b FROM verif$semUnion),
         | sym AS (SELECT a, b FROM ed UNION SELECT b AS a, a AS b FROM ed),
         | lp AS (SELECT DISTINCT a AS doc, a AS label FROM sym
         |        UNION
         |        SELECT s.b AS doc, lp.label FROM lp JOIN sym s ON s.a = lp.doc),
         | comp AS (SELECT doc, min(label) AS keep FROM lp GROUP BY doc)""".stripMargin
  }

  private def keepListSql(withSemantic: Boolean): String =
    keepListCtes(withSemantic) +
      """
        |SELECT d.doc_id, CAST(coalesce(c.keep, d.doc_id) AS BIGINT) AS keep_id
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc""".stripMargin

  /** The composed end-to-end curation-pipeline oracle: the keep-list CTE
    * chain (→ `comp`) over the CORPUS slice (doc_id % 5 ≠ 0 — the eval
    * slice is the held-out suite, not corpus, so dedup never sees it),
    * the decontamination branches (p*-renamed copies of the text_decontam
    * mirror, flags only), then the quality gates (word count, mean word
    * length, bigram-repetition fraction), LCG-coin sampling and the
    * window-form prefix sum — the same stages chained in SQL exactly as
    * Queries.curationPipeline chains the operators. Every constant the
    * config carries (keep-list threshold, decontam shingle length, the
    * quality gates, sampling band/rates, seqLen) is read from the SAME
    * CurationConfig instance the catalog entry pins, so THOSE can never
    * drift between the engines; the shingle n = 3 and 4×4 banding shape
    * remain the operator-family constants shared with the dedup entries
    * (not config knobs on either side). */
  private val catalogCuration = CurationConfig()

  private def curationPipelineSql: String = {
    import graft.operators.Dedup.{HashA, HashB}
    val cfg = catalogCuration
    val corpusSrc = "(SELECT * FROM documents WHERE doc_id % 5 <> 0)"
    val repGate = cfg.maxBigramDupFrac.map(t =>
      s"""
         |     AND (CASE WHEN len(bi) > 0
         |       THEN CAST(1 AS DOUBLE) - CAST(len(list_distinct(bi)) AS DOUBLE) / CAST(len(bi) AS DOUBLE)
         |       ELSE CAST(0 AS DOUBLE) END) <= $t""".stripMargin).getOrElse("")
    keepListCtes(withSemantic = false, src = corpusSrc,
        pct = cfg.minSharedPct) +
      s""",
         | pd AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
         | pev AS (SELECT doc_id AS eval_id, ws FROM pd WHERE doc_id % 5 = 0),
         | pco AS (SELECT doc_id, ws FROM pd WHERE doc_id % 5 <> 0),
         | pcog AS (SELECT doc_id, unnest(list_distinct(list_filter(list_transform(ws, (x,i) ->
         |     CASE WHEN i+${cfg.decontamShingleN - 1} <= len(ws) THEN array_to_string(list_slice(ws, i, i+${cfg.decontamShingleN - 1}), ' ') END),
         |     s -> s IS NOT NULL))) AS g FROM pco WHERE len(ws) >= ${cfg.decontamShingleN}),
         | pevg AS (SELECT eval_id, unnest(list_distinct(list_filter(list_transform(ws, (x,i) ->
         |     CASE WHEN i+${cfg.decontamShingleN - 1} <= len(ws) THEN array_to_string(list_slice(ws, i, i+${cfg.decontamShingleN - 1}), ' ') END),
         |     s -> s IS NOT NULL))) AS g FROM pev WHERE len(ws) >= ${cfg.decontamShingleN}),
         | pm1 AS (SELECT doc_id FROM pcog JOIN pevg USING (g)),
         | pevs AS (SELECT eval_id, array_to_string(ws,' ') AS g, len(ws) AS l
         |         FROM pev WHERE len(ws) < ${cfg.decontamShingleN}),
         | pevl AS (SELECT DISTINCT l FROM pevs),
         | pcosw AS (SELECT doc_id, unnest(list_distinct(list_filter(list_transform(ws, (x,i) ->
         |     CASE WHEN i+pevl.l-1 <= len(ws) THEN array_to_string(list_slice(ws, i, i+pevl.l-1), ' ') END),
         |     s -> s IS NOT NULL))) AS g FROM pco CROSS JOIN pevl WHERE len(ws) >= pevl.l),
         | pm2 AS (SELECT doc_id FROM pcosw JOIN pevs ON pcosw.g = pevs.g),
         | pcos AS (SELECT doc_id, array_to_string(ws,' ') AS g FROM pco WHERE len(ws) < ${cfg.decontamShingleN}),
         | pcol AS (SELECT DISTINCT len(ws) AS l FROM pco WHERE len(ws) < ${cfg.decontamShingleN}),
         | pevgw AS (SELECT eval_id, unnest(list_distinct(list_filter(list_transform(ws, (x,i) ->
         |     CASE WHEN i+pcol.l-1 <= len(ws) THEN array_to_string(list_slice(ws, i, i+pcol.l-1), ' ') END),
         |     s -> s IS NOT NULL))) AS g FROM pev CROSS JOIN pcol WHERE len(ws) >= pcol.l),
         | pm3 AS (SELECT doc_id FROM pcos JOIN pevgw ON pcos.g = pevgw.g),
         | pflag AS (SELECT DISTINCT doc_id FROM
         |   (SELECT doc_id FROM pm1 UNION ALL SELECT doc_id FROM pm2
         |    UNION ALL SELECT doc_id FROM pm3) u),
         | surv AS (SELECT dd.doc_id, string_split(dd.text,' ') AS ws
         |   FROM documents dd LEFT JOIN comp c ON dd.doc_id = c.doc
         |   WHERE coalesce(c.keep, dd.doc_id) = dd.doc_id AND dd.doc_id % 5 <> 0
         |     AND NOT EXISTS (SELECT 1 FROM pflag f WHERE f.doc_id = dd.doc_id)),
         | qual AS (SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words,
         |     CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)/len(ws) AS mwl,
         |     list_filter(list_transform(ws, (x,i) ->
         |       CASE WHEN i+1 <= len(ws) THEN array_to_string(list_slice(ws, i, i+1), ' ') END),
         |       s -> s IS NOT NULL) AS bi
         |   FROM surv),
         | kept AS (SELECT doc_id, n_words FROM qual
         |   WHERE n_words >= ${cfg.minWords} AND n_words <= ${cfg.maxWords}
         |     AND mwl >= ${cfg.minMeanWordLen} AND mwl <= ${cfg.maxMeanWordLen}$repGate),
         | samp AS (SELECT doc_id, CAST(n_words AS BIGINT) AS n_tokens,
         |     CASE WHEN n_words < ${cfg.shortBandWords} THEN 'short' ELSE 'long' END AS stratum,
         |     ((${HashA(0)}*doc_id + ${HashB(0)}) % $P) % 1000 AS coin
         |   FROM kept),
         | sel AS (SELECT doc_id, stratum, n_tokens FROM samp
         |   WHERE coin < CASE stratum WHEN 'short' THEN ${cfg.shortPermille} ELSE ${cfg.longPermille} END),
         | pk AS (SELECT doc_id, stratum, n_tokens,
         |   CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |  FROM sel)
         |SELECT doc_id, stratum, n_tokens, start_offset,
         | CAST(floor(CAST(start_offset AS DOUBLE) / ${cfg.seqLen}) AS BIGINT) AS bin
         |FROM pk""".stripMargin
  }

  /** Quantized (×1000 floor, BIGINT) per-dimension embedding CTE `v`. */
  private val quantVCte: String =
    """WITH v AS (SELECT vec_id, i, CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) AS qx
      |   FROM (SELECT vec_id, unnest(embedding) AS x,
      |                unnest(range(0, len(embedding))) AS i FROM embeddings))""".stripMargin

  /** Integer hyperplane-weight CTE `w(b, i, wgt)` for `bits` planes. */
  private def planeWgtCte(bits: Int): String =
    s""" w AS (SELECT b, i, ((1103515245*(b*97+i+1)+12345) % 2003) - 1001 AS wgt
       |   FROM (SELECT unnest(range(0,$bits)) AS b) bs, (SELECT DISTINCT i FROM v) ds)""".stripMargin

  /** simsearch_ivf oracle: the ENTIRE integer-quantized IVF — Lloyd
    * training included — unrolled in generated SQL. Mirrors
    * SimSearch.trainIvfCentroidsQuantized step for step: ×1000-floor
    * BIGINT vectors; sample = first `sampleN` rows by vec_id; init
    * centroid c = sample(c mod n); per-iteration argmin by integer squared
    * distance with ties to the lowest cell (row_number ORDER BY dist,
    * cell); centroid mean = floor(sum/count) — exact because coordinate
    * sums of ≤2048 values ≤~531 fit a double — with empty cells keeping
    * their previous centroid (LEFT JOIN + coalesce); then nProbe nearest
    * cells for the vec_id-0 query and the portable sign(dot)·dot²/‖v‖²
    * ranking. Every step is integer arithmetic, so the match is bit-exact. */
  private def ivfSqlGen(nCells: Int, sampleN: Int, iters: Int,
                        nProbe: Int, k: Int): String = {
    def dist(v: String, c: String) =
      s"list_sum(list_transform($v, (x,i) -> (x - $c[i])*(x - $c[i])))"
    val iterCtes = (0 until iters).map { t =>
      s""" a$t AS (SELECT rn, qv, cell FROM (
         |    SELECT s.rn, s.qv, c.cell,
         |      row_number() OVER (PARTITION BY s.rn
         |        ORDER BY ${dist("s.qv", "c.cv")}, c.cell) AS rk
         |    FROM samp s CROSS JOIN c$t c) WHERE rk = 1),
         | m$t AS (SELECT cell, ii.i AS idx,
         |      CAST(floor(CAST(sum(qv[ii.i]) AS DOUBLE)/count(*)) AS BIGINT) AS mu
         |    FROM a$t CROSS JOIN dims ii GROUP BY cell, ii.i),
         | c${t + 1} AS (SELECT p.cell, coalesce(n.cv, p.cv) AS cv
         |    FROM c$t p LEFT JOIN
         |      (SELECT cell, list(mu ORDER BY idx) AS cv FROM m$t GROUP BY cell) n
         |      ON n.cell = p.cell)""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS (SELECT vec_id, list_transform(embedding,
       |     x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv FROM embeddings),
       | samp AS (SELECT qv, row_number() OVER (ORDER BY vec_id) - 1 AS rn
       |          FROM v ORDER BY vec_id LIMIT $sampleN),
       | nsamp AS (SELECT count(*) AS n FROM samp),
       | dims AS (SELECT unnest(range(1, (SELECT max(len(qv)) FROM samp)+1)) AS i),
       | c0 AS (SELECT cs.cell, s.qv AS cv
       |        FROM (SELECT unnest(range(0,$nCells)) AS cell) cs, nsamp, samp s
       |        WHERE s.rn = cs.cell % nsamp.n),
       |$iterCtes,
       | qq AS (SELECT qv FROM v WHERE vec_id = 0),
       | probe AS (SELECT cell FROM (
       |     SELECT c.cell, row_number() OVER (
       |       ORDER BY ${dist("q.qv", "c.cv")}, c.cell) AS rk
       |     FROM c$iters c, qq q) WHERE rk <= $nProbe),
       | asg AS (SELECT vec_id, cell FROM (
       |     SELECT e.vec_id, c.cell,
       |       row_number() OVER (PARTITION BY e.vec_id
       |         ORDER BY ${dist("e.qv", "c.cv")}, c.cell) AS rk
       |     FROM v e CROSS JOIN c$iters c) WHERE rk = 1),
       | sc AS (SELECT v.vec_id,
       |     CAST(list_sum(list_transform(v.qv, (x,i) -> x * q.qv[i])) AS BIGINT) AS qdot,
       |     CAST(list_sum(list_transform(v.qv, x -> x*x)) AS BIGINT) AS qna
       |   FROM v, qq q)
       |SELECT sc.vec_id, sc.qdot, sc.qna
       |FROM sc JOIN asg ON sc.vec_id = asg.vec_id
       |  JOIN probe ON asg.cell = probe.cell
       |WHERE sc.qna > 0
       |ORDER BY CAST(CASE WHEN sc.qdot < 0 THEN -1 ELSE 1 END AS DOUBLE) *
       |  (CAST(sc.qdot AS DOUBLE)*CAST(sc.qdot AS DOUBLE)/CAST(sc.qna AS DOUBLE)) DESC,
       |  sc.vec_id
       |LIMIT $k""".stripMargin
  }

  /** DuckDB-equivalent SQL per oracle-checkable query — every catalog
    * entry now has one (simsearch_ivf joined the family this round via the
    * integer-quantized Lloyd above). */
  def oracleSql: Map[String, String] = Map(
    "simsearch_ivf" ->
      ivfSqlGen(nCells = 16, sampleN = 2048, iters = 5, nProbe = 3, k = 20),
    // The FULL typed pipeline (Aho-Corasick mentions → pair generation →
    // window fit → lexicon scoring → canonical triples), SQL-mirrored.
    // The mirror is exact because of testdata-shape facts each verified in
    // specs/oracles: text is punctuation-free lowercase words (tokenizer
    // tokens == space-split words; one sentence per doc so sent_dist = 0
    // and the F4 prune never binds), and no vocabulary word contains a
    // dictionary/trigger surface (mention token positions == word
    // positions — OperatorsSpec's replace-counting check). Semantics
    // mirrored per mention PAIR (multiset — repeated surfaces emit
    // repeated triples), trigger strictly between the mentions, window
    // fit (p2-p1+1) + 4 <= 128, subj/obj = least/greatest canonical id.
    "kg_pipeline_triples" -> {
      val dict = Queries.kgDictWords.map(w => s"'$w'").mkString(", ")
      val trig = Queries.kgTriggerWords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS w,
         |     unnest(range(1, len(string_split(text,' '))+1)) AS pos FROM documents),
         | m AS (SELECT doc_id, pos, w FROM t WHERE w IN ($dict)),
         | trg AS (SELECT doc_id, pos FROM t WHERE w IN ($trig))
         |SELECT a.doc_id,
         |  least('ent:' || a.w, 'ent:' || b.w) AS subj,
         |  'Complex_formation' AS pred,
         |  greatest('ent:' || a.w, 'ent:' || b.w) AS obj
         |FROM m a JOIN m b
         |  ON a.doc_id = b.doc_id AND a.pos < b.pos
         |  AND (b.pos - a.pos + 1) + 4 <= 128
         |WHERE EXISTS (SELECT 1 FROM trg
         |              WHERE trg.doc_id = a.doc_id
         |                AND trg.pos > a.pos AND trg.pos < b.pos)""".stripMargin
    },
    "dedup_minhash_lsh" ->
      (minhashCandCtes() + "\nSELECT doc_a, doc_b FROM cand"),
    "dedup_lsh_verified" ->
      (lshVerifiedCtes() +
        "\nSELECT doc_a, doc_b, n_common, n_a, n_b FROM verif"),
    // the corpus dedup deliverable: exact-dup edges ∪ the verified
    // near-dup pairs, closed transitively (recursive min-label
    // propagation == the engine's connected components; numeric min ==
    // the engine's %020d-padded string min for non-negative ids)
    "dedup_keep_list" -> keepListSql(withSemantic = false),
    // token-distribution drift between the parity snapshot halves:
    // exact ppm rates, deterministic (diff DESC, token ASC) top-50
    "corpus_drift" ->
      """WITH ca AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt_a FROM (
        |    SELECT unnest(string_split(text,' ')) AS w FROM documents
        |    WHERE doc_id % 2 = 0) x GROUP BY w),
        | cb AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt_b FROM (
        |    SELECT unnest(string_split(text,' ')) AS w FROM documents
        |    WHERE doc_id % 2 <> 0) x GROUP BY w),
        | ta AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a FROM ca),
        | tb AS (SELECT CAST(sum(cnt_b) AS BIGINT) AS tot_b FROM cb),
        | j AS (SELECT COALESCE(ca.w, cb.w) AS w,
        |    COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
        |   FROM ca FULL OUTER JOIN cb ON ca.w = cb.w),
        | r AS (SELECT w, cnt_a, cnt_b,
        |    (cnt_a * 1000000) // tot_a AS ppm_a,
        |    (cnt_b * 1000000) // tot_b AS ppm_b
        |   FROM j CROSS JOIN ta CROSS JOIN tb)
        |SELECT w, cnt_a, cnt_b, ppm_a, ppm_b, abs(ppm_a - ppm_b) AS ppm_diff
        |FROM r ORDER BY ppm_diff DESC, w ASC LIMIT 50""".stripMargin,
    // per-language audit: volumes + dup count (keep-list closure) +
    // quality-gate pass count, one GROUP BY lang. Gate constants read
    // from the same catalogCuration the pipeline oracle uses; LEFT joins
    // mirror the Spark side so a null-doc_id row stays in the volumes
    // (an equi-join would silently drop it from the oracle only)
    "corpus_audit" -> {
      val cfg = catalogCuration
      keepListCtes(withSemantic = false) +
        s""",
          | kl AS (SELECT d.doc_id, coalesce(c.keep, d.doc_id) AS keep_id
          |   FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc),
          | gq AS (SELECT doc_id, CASE WHEN len(ws) >= ${cfg.minWords} AND len(ws) <= ${cfg.maxWords}
          |     AND CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)/len(ws) >= ${cfg.minMeanWordLen}
          |     AND CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)/len(ws) <= ${cfg.maxMeanWordLen}
          |    THEN 1 ELSE 0 END AS passq
          |   FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents) x),
          | au AS (SELECT lang, doc_id, len(string_split(text,' ')) AS n_tokens
          |   FROM documents)
          |SELECT au.lang,
          | CAST(count(*) AS BIGINT) AS n_docs,
          | CAST(sum(CASE WHEN kl.keep_id <> kl.doc_id THEN 1 ELSE 0 END) AS BIGINT)
          |   AS n_dup_docs,
          | CAST(COALESCE(sum(passq), 0) AS BIGINT) AS n_pass_quality,
          | CAST(sum(n_tokens) AS BIGINT) AS total_tokens
          |FROM au LEFT JOIN kl ON au.doc_id = kl.doc_id
          |        LEFT JOIN gq ON au.doc_id = gq.doc_id
          |GROUP BY au.lang""".stripMargin
    },
    // reporting rollup over the same closure: cluster-size histogram
    "dedup_cluster_sizes" ->
      (keepListCtes(withSemantic = false) +
        """
          |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters FROM (
          |  SELECT keep_id, CAST(count(*) AS BIGINT) AS cluster_size FROM (
          |    SELECT d.doc_id, coalesce(c.keep, d.doc_id) AS keep_id
          |    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc) k
          |  GROUP BY keep_id) h
          |GROUP BY cluster_size""".stripMargin),
    // the three-edge-source variant: + embedding cosine near-dup edges
    "dedup_keep_list_semantic" -> keepListSql(withSemantic = true),
    // the end-to-end curation deliverable (five verified stages chained)
    "curation_pipeline" -> curationPipelineSql,
    // incremental maintenance: the oracle is the FULL-recompute SQL —
    // a hash match proves delta closure == from-scratch keep-list
    "dedup_keep_list_delta" -> keepListSql(withSemantic = false),
    "dedup_simhash" -> simhashSqlGen,
    "dedup_embedding_cosine" ->
      (quantVCte + "," + planeWgtCte(6) +
        """,
          | dots AS (SELECT v.vec_id, w.b, sum(v.qx*w.wgt) AS d
          |          FROM v JOIN w ON v.i = w.i GROUP BY 1, 2),
          | buck AS (SELECT vec_id,
          |     CAST(sum(CASE WHEN d > 0 THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
          |   FROM dots GROUP BY 1),
          | pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          |   FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
          | dotp AS (SELECT vec_a, vec_b, CAST(sum(x.qx*y.qx) AS BIGINT) AS qdot
          |   FROM pairs JOIN v x ON x.vec_id = vec_a
          |   JOIN v y ON y.vec_id = vec_b AND y.i = x.i
          |   GROUP BY 1, 2),
          | norms AS (SELECT vec_id, CAST(sum(qx*qx) AS BIGINT) AS n FROM v GROUP BY 1)
          |SELECT vec_a, vec_b, qdot, na.n AS qna, nb.n AS qnb
          |FROM dotp JOIN norms na ON vec_a = na.vec_id
          |  JOIN norms nb ON vec_b = nb.vec_id
          |WHERE qdot > 0 AND 400*qdot*qdot >= 9*na.n*nb.n""".stripMargin),
    "simsearch_cosine" ->
      (quantVCte +
        """,
          | q AS (SELECT i, qx FROM v WHERE vec_id = 0),
          | s AS (SELECT v.vec_id, CAST(sum(v.qx*q.qx) AS BIGINT) AS qdot,
          |         CAST(sum(v.qx*v.qx) AS BIGINT) AS qna
          |       FROM v JOIN q ON v.i = q.i GROUP BY 1)
          |SELECT vec_id, qdot, qna FROM s WHERE qna > 0
          |ORDER BY CAST(CASE WHEN qdot < 0 THEN -1 ELSE 1 END AS DOUBLE) *
          |  (CAST(qdot AS DOUBLE)*CAST(qdot AS DOUBLE)/CAST(qna AS DOUBLE)) DESC, vec_id
          |LIMIT 20""".stripMargin),
    "simsearch_lsh" ->
      (quantVCte + "," + planeWgtCte(4) +
        """,
          | q AS (SELECT i, qx FROM v WHERE vec_id = 0),
          | dots AS (SELECT v.vec_id, w.b, sum(v.qx*w.wgt) AS d
          |          FROM v JOIN w ON v.i = w.i GROUP BY 1, 2),
          | buck AS (SELECT vec_id,
          |     CAST(sum(CASE WHEN d > 0 THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
          |   FROM dots GROUP BY 1),
          | qdots AS (SELECT w.b, sum(q.qx*w.wgt) AS d
          |           FROM q JOIN w ON q.i = w.i GROUP BY 1),
          | qb AS (SELECT CAST(sum(CASE WHEN d > 0 THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS qbucket
          |        FROM qdots),
          | sc AS (SELECT v.vec_id, CAST(sum(v.qx*q.qx) AS BIGINT) AS qdot
          |        FROM v JOIN q ON v.i = q.i GROUP BY 1)
          |SELECT sc.vec_id, sc.qdot
          |FROM sc JOIN buck ON sc.vec_id = buck.vec_id, qb
          |WHERE buck.bucket = qb.qbucket
          |   OR xor(buck.bucket, qb.qbucket) IN (1, 2, 4, 8)
          |ORDER BY sc.qdot DESC, sc.vec_id LIMIT 20""".stripMargin),
    "text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS w,
         |     unnest(range(1, len(string_split(text,' '))+1)) AS pos FROM documents),
         | vocab AS (SELECT w, row_number() OVER (ORDER BY w) AS tid
         |           FROM (SELECT DISTINCT w FROM t))
         |SELECT doc_id,
         |  CAST(sum(((37*tid+17) % $P) * ((61*pos+29) % $P)) AS BIGINT) AS fp
         |FROM t JOIN vocab USING (w) GROUP BY doc_id""".stripMargin,
    // sequence packing: the oracle uses the window-function form the
    // engine deliberately avoids (both compute the same exclusive prefix
    // sum; only the execution differs). DuckDB window sums promote to
    // HUGEINT -> cast back
    "text_pack" ->
      """WITH d AS (SELECT doc_id,
        |   COALESCE(CAST(len(string_split(text,' ')) AS BIGINT), 0) AS n_tokens
        |  FROM documents WHERE doc_id IS NOT NULL),
        | c AS (SELECT doc_id, n_tokens,
        |   CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |     AS start_offset
        |  FROM d)
        |SELECT doc_id, n_tokens, start_offset,
        | CAST(floor(CAST(start_offset AS DOUBLE) / 2048) AS BIGINT) AS bin
        |FROM c""".stripMargin,
    // per-chunk packing: same prefix sum, then one row per bin spanned
    // ([start/L .. (start+n-1)/L]) via a range() unnest; slice bounds are
    // pure integer min/max arithmetic. Zero-token docs emit no chunks.
    "text_pack_chunks" ->
      """WITH d AS (SELECT doc_id,
        |   COALESCE(CAST(len(string_split(text,' ')) AS BIGINT), 0) AS n_tokens
        |  FROM documents WHERE doc_id IS NOT NULL),
        | c AS (SELECT doc_id, n_tokens,
        |   CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |     AS start_offset
        |  FROM d),
        | ch AS (SELECT doc_id, start_offset, n_tokens,
        |   unnest(range(CAST(floor(CAST(start_offset AS DOUBLE)/2048) AS BIGINT),
        |     CAST(floor(CAST(start_offset + n_tokens - 1 AS DOUBLE)/2048) AS BIGINT) + 1)) AS bin
        |  FROM c WHERE n_tokens > 0)
        |SELECT doc_id, bin,
        | CAST(greatest(start_offset, bin*2048) - bin*2048 AS BIGINT) AS offset_in_bin,
        | CAST(least(start_offset + n_tokens, (bin+1)*2048)
        |      - greatest(start_offset, bin*2048) AS BIGINT) AS n_tokens
        |FROM ch""".stripMargin,
    // Gopher quality rules: integer counts + single per-row IEEE divisions
    // (identical operands both engines → bit-identical doubles); the '...'
    // symbol count divides an exact multiple of 3, so the / is exact
    "text_gopher" ->
      """WITH d AS (SELECT doc_id, text, string_split(text,' ') AS ws,
        |   string_split(text, chr(10)) AS ls FROM documents),
        | c AS (SELECT doc_id,
        |   CAST(len(ws) AS INTEGER) AS n_words,
        |   CAST(list_sum(list_transform(ws, x -> length(x))) AS INTEGER) AS n_word_chars,
        |   CAST((length(text) - length(replace(text,'#','')))
        |     + (length(text) - length(replace(text,'...','')))/3 AS INTEGER) AS n_symbols,
        |   CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS INTEGER) AS n_alpha_words,
        |   CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |     s -> list_contains(ws, s))) AS INTEGER) AS n_stop_hits,
        |   CAST(len(ls) AS INTEGER) AS n_lines,
        |   CAST(len(list_filter(ls, l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '•%'))
        |     AS INTEGER) AS n_bullet_lines,
        |   CAST(len(list_filter(ls, l -> l LIKE '%...' OR l LIKE '%…'))
        |     AS INTEGER) AS n_ellipsis_lines
        |  FROM d)
        |SELECT doc_id, n_words, n_symbols, n_alpha_words, n_stop_hits,
        | n_lines, n_bullet_lines, n_ellipsis_lines,
        | CAST(n_word_chars AS DOUBLE)/n_words AS mean_word_len,
        | CAST(n_symbols AS DOUBLE)/n_words AS symbol_word_ratio,
        | CAST(n_alpha_words AS DOUBLE)/n_words AS frac_alpha_words,
        | CAST(n_bullet_lines AS DOUBLE)/n_lines AS frac_bullet_lines,
        | CAST(n_ellipsis_lines AS DOUBLE)/n_lines AS frac_ellipsis_lines,
        | CAST(n_words >= 50 AND n_words <= 100000
        |   AND CAST(n_word_chars AS DOUBLE)/n_words >= 3.0
        |   AND CAST(n_word_chars AS DOUBLE)/n_words <= 10.0
        |   AND CAST(n_symbols AS DOUBLE)/n_words <= 0.1
        |   AND CAST(n_bullet_lines AS DOUBLE)/n_lines < 0.9
        |   AND CAST(n_ellipsis_lines AS DOUBLE)/n_lines < 0.3
        |   AND CAST(n_alpha_words AS DOUBLE)/n_words >= 0.8
        |   AND n_stop_hits >= 2 AS INTEGER) AS passes_gopher
        |FROM c""".stripMargin,
    // PII redaction: the oracle rebuilds the planted text from doc_id with
    // string concatenation and runs the SAME regex constants through RE2
    // (DuckDB) that Spark runs through java.util.regex — the patterns are
    // restricted to the syntax where the two engines agree (TextAnalysis
    // scaladoc). Counts are per-pass sequential, mirroring piiRedact.
    "text_pii" -> {
      import graft.operators.TextAnalysis.{EmailRe, Ipv4Re, PhoneRe}
      s"""WITH d AS (SELECT doc_id, CASE
         |   WHEN doc_id % 7 = 2 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
         |     || '@m' || CAST(doc_id % 10 AS VARCHAR) || '.example.com now'
         |   WHEN doc_id % 7 = 4 THEN text || ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
         |     || '.' || CAST((doc_id*3) % 256 AS VARCHAR)
         |     || '.' || CAST((doc_id*5) % 256 AS VARCHAR) || ' up'
         |   WHEN doc_id % 7 = 6 THEN text || ' call +' || CAST(1 + doc_id % 9 AS VARCHAR)
         |     || ' ' || CAST(100 + doc_id % 900 AS VARCHAR)
         |     || ' ' || CAST(100 + (doc_id*3) % 900 AS VARCHAR)
         |     || ' ' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' ok'
         |   ELSE text END AS text FROM documents),
         | e AS (SELECT doc_id, text, regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS t1 FROM d),
         | i AS (SELECT doc_id, text, t1, regexp_replace(t1, '$Ipv4Re', '<IP>', 'g') AS t2 FROM e)
         |SELECT doc_id, regexp_replace(t2, '$PhoneRe', '<PHONE>', 'g') AS clean_text,
         | CAST(COALESCE(len(regexp_extract_all(text, '$EmailRe')), 0) AS BIGINT) AS n_emails,
         | CAST(COALESCE(len(regexp_extract_all(t1, '$Ipv4Re')), 0) AS BIGINT) AS n_ips,
         | CAST(COALESCE(len(regexp_extract_all(t2, '$PhoneRe')), 0) AS BIGINT) AS n_phones
         |FROM i""".stripMargin
    },
    // URL/domain blocklist: planted URLs rebuilt from doc_id, the same
    // extract/host/registered-domain regexes re-run through RE2, equi-join
    // on the registered domain against the generated VALUES blocklist
    "text_url_flags" -> {
      import graft.operators.TextAnalysis.{HostRe, RegDomainRe, UrlRe}
      val bl = Queries.UrlBlocklist.map(d => s"('$d')").mkString(", ")
      s"""WITH bl(domain) AS (VALUES $bl),
         | d AS (SELECT doc_id, CASE WHEN doc_id % 9 = 5
         |   THEN text || ' see https://w' || CAST(doc_id % 50 AS VARCHAR)
         |     || '.example' || CAST(doc_id % 7 AS VARCHAR)
         |     || '.org/p/' || CAST(doc_id AS VARCHAR) || ' end'
         |   ELSE text END AS text FROM documents),
         | u AS (SELECT doc_id, unnest(regexp_extract_all(text, '$UrlRe')) AS url
         |   FROM d WHERE text IS NOT NULL AND doc_id IS NOT NULL),
         | h AS (SELECT doc_id, url, regexp_extract(url, '$HostRe', 1) AS host FROM u),
         | r AS (SELECT doc_id, url, regexp_extract(host, '$RegDomainRe', 1) AS domain FROM h)
         |SELECT doc_id, url, r.domain AS domain
         |FROM r JOIN bl ON r.domain = bl.domain""".stripMargin
    },
    // repeated-passage detection: positioned k-grams, cross-doc census,
    // gaps-and-islands interval merge — the window frames are identical
    // in both engines (ROWS UNBOUNDED..1 PRECEDING cummax; running sum)
    "text_dup_passages" ->
      s"""$dupPassageCtes
         |SELECT doc_id, start_tok, end_tok, n_grams FROM iv""".stripMargin,
    // detection -> removal composed: tokens LEFT JOIN the merged intervals
    // on the doc key (disjoint ranges: at most one match per token), the
    // string_agg ORDER BY skips removed tokens like collect_list skips
    // nulls; a fully-duplicated doc COALESCEs to the empty string
    "text_passage_clean" ->
      s"""$dupPassageCtes,
         | allt AS (SELECT doc_id, unnest(string_split(text,' ')) AS w,
         |    unnest(range(0, len(string_split(text,' ')))) AS pos
         |   FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
         | mk AS (SELECT a.doc_id, a.pos, a.w, iv.start_tok FROM allt a
         |   LEFT JOIN iv ON iv.doc_id = a.doc_id
         |    AND a.pos >= iv.start_tok AND a.pos < iv.end_tok)
         |SELECT doc_id,
         | COALESCE(string_agg(CASE WHEN start_tok IS NULL THEN w END, ' ' ORDER BY pos), '')
         |   AS clean_text,
         | CAST(sum(CASE WHEN start_tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_removed_tokens
         |FROM mk GROUP BY doc_id""".stripMargin,
    // uniform language-mix rebalance: integer floor-div rates + LCG coin
    "text_mixture" -> {
      import graft.operators.Dedup.{HashA, HashB}
      s"""WITH c AS (SELECT lang AS grp, CAST(count(*) AS BIGINT) AS cnt
         |   FROM documents GROUP BY 1),
         | t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
         |        CAST(count(*) AS BIGINT) AS ngroups FROM c),
         | r AS (SELECT grp, CAST(LEAST(1000, (1000*total) // (ngroups*cnt)) AS BIGINT)
         |        AS rate_pm FROM c CROSS JOIN t),
         | d AS (SELECT doc_id, lang,
         |        ((${HashA(1)}*doc_id + ${HashB(1)}) % $P) % 1000 AS coin FROM documents)
         |SELECT doc_id, lang, rate_pm, coin
         |FROM d JOIN r ON d.lang IS NOT DISTINCT FROM r.grp
         |WHERE coin < rate_pm""".stripMargin
    },
    // weighted mixture: the targets VALUES list is generated from the
    // same Scala constant the binder feeds the operator
    "text_mixture_weighted" -> {
      import graft.operators.Dedup.{HashA, HashB}
      val values = Queries.MixtureTargets
        .map { case (g, p) => s"('$g', ${p})" }.mkString(", ")
      s"""WITH tgt(grp, target_ppm) AS (VALUES $values),
         | c AS (SELECT lang AS grp, CAST(count(*) AS BIGINT) AS cnt
         |   FROM documents GROUP BY 1),
         | t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
         | r AS (SELECT c.grp, CAST(LEAST(1000, (target_ppm*total) // (1000*cnt)) AS BIGINT)
         |        AS rate_pm FROM c JOIN tgt ON c.grp IS NOT DISTINCT FROM tgt.grp
         |        CROSS JOIN t),
         | d AS (SELECT doc_id, lang,
         |        ((${HashA(2)}*doc_id + ${HashB(2)}) % $P) % 1000 AS coin FROM documents)
         |SELECT doc_id, lang, rate_pm, coin
         |FROM d JOIN r ON d.lang IS NOT DISTINCT FROM r.grp
         |WHERE coin < rate_pm""".stripMargin
    },
    // hashed linear classifier: same dense word vocabulary as the
    // fingerprint/simhash family, weights a pure LCG function of tid
    "text_classifier" -> {
      import graft.operators.TextAnalysis.{ClsA, ClsB, ClsDim}
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
         | vocab AS (SELECT w, row_number() OVER (ORDER BY w) AS tid
         |           FROM (SELECT DISTINCT w FROM t)),
         | s AS (SELECT doc_id, CAST(sum((($ClsA*(tid % $ClsDim) + $ClsB) % $P) % 2001 - 1000)
         |        AS BIGINT) AS logit
         |       FROM t JOIN vocab USING (w) GROUP BY doc_id)
         |SELECT doc_id, logit, CAST(logit > 0 AS INTEGER) AS label_keep FROM s""".stripMargin
    },
    // count-min sketch rebuilt cell-for-cell: 3 LCG hash rows over the
    // dense vocabulary rank, estimate = min cell, exact counts beside
    "text_cms_counts" -> {
      import graft.operators.Dedup.{HashA, HashB}
      val rows = (0 until 3).map { j =>
        s"""SELECT sh, n, $j AS j,
           |   ((${HashA(j)}*tid + ${HashB(j)}) % $P) % 64 AS b FROM wc"""
          .stripMargin
      }.mkString("\n   UNION ALL ")
      s"""WITH toks AS (SELECT unnest(string_split(text,' ')) AS sh
         |   FROM documents WHERE text IS NOT NULL),
         | tf AS (SELECT sh FROM toks WHERE length(sh) > 0),
         | counts AS (SELECT sh, count(*) AS n FROM tf GROUP BY sh),
         | vocab AS (SELECT sh, row_number() OVER (ORDER BY sh) AS tid
         |   FROM (SELECT DISTINCT sh FROM tf)),
         | wc AS (SELECT c.sh, c.n, v.tid FROM counts c JOIN vocab v USING (sh)),
         | jb AS ($rows),
         | cells AS (SELECT j, b, CAST(sum(n) AS BIGINT) AS cell
         |   FROM jb GROUP BY 1, 2)
         |SELECT jb.sh AS token, min(jb.n) AS n_exact, min(cell) AS n_est
         |FROM jb JOIN cells USING (j, b) GROUP BY jb.sh""".stripMargin
    },
    // KMV bottom-k distinct sketch: k smallest distinct LCG hashes per
    // lang, estimate (k-1)*P // h_k, exact small-set fallback
    "text_kmv_distinct" -> {
      import graft.operators.Dedup.{HashA, HashB}
      val k = 16
      s"""WITH toks AS (SELECT lang, unnest(string_split(text,' ')) AS sh
         |   FROM documents WHERE text IS NOT NULL),
         | tf AS (SELECT DISTINCT lang, sh FROM toks WHERE length(sh) > 0),
         | vocab AS (SELECT sh, row_number() OVER (ORDER BY sh) AS tid
         |   FROM (SELECT DISTINCT sh FROM tf)),
         | hs AS (SELECT lang, tid, (${HashA(4)}*tid + ${HashB(4)}) % $P AS h
         |   FROM tf JOIN vocab USING (sh)),
         | hd AS (SELECT DISTINCT lang, h FROM hs),
         | mins AS (SELECT lang, h FROM (SELECT lang, h,
         |     row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
         |   FROM hd) WHERE rn <= $k),
         | kth AS (SELECT lang, max(h) AS hk, count(*) AS m FROM mins
         |   GROUP BY lang),
         | ex AS (SELECT lang, count(DISTINCT tid) AS n_exact FROM hs
         |   GROUP BY lang)
         |SELECT ex.lang, n_exact,
         |  CASE WHEN m < $k THEN m
         |       ELSE (${k - 1} * $P) // hk END AS n_est
         |FROM ex JOIN kth ON ex.lang IS NOT DISTINCT FROM kth.lang"""
        .stripMargin
    },
    // cross-source n-gram overlap census (contamination matrix)
    "corpus_overlap" -> {
      val k = Queries.PassageK; val km1 = k - 1
      s"""WITH d AS (SELECT doc_id, source, string_split(text,' ') AS ws FROM documents
         |   WHERE text IS NOT NULL AND doc_id IS NOT NULL AND source IS NOT NULL),
         | g AS (SELECT DISTINCT source, gr FROM (SELECT source,
         |    unnest(list_transform(range(0, len(ws)-$km1),
         |      i -> array_to_string(list_slice(ws, i+1, i+$k), ' '))) AS gr FROM d) x),
         | tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY source),
         | sh AS (SELECT a.source AS source_a, b.source AS source_b,
         |        CAST(count(*) AS BIGINT) AS shared_grams
         |        FROM g a JOIN g b ON a.gr = b.gr AND a.source < b.source GROUP BY 1, 2)
         |SELECT source_a, source_b, shared_grams, ta.n AS grams_a, tb.n AS grams_b
         |FROM sh JOIN tot ta ON sh.source_a = ta.source
         |        JOIN tot tb ON sh.source_b = tb.source""".stripMargin
    },
    // corpus reporting rollup: exact integers + one per-group division
    "corpus_stats" ->
      """WITH d AS (SELECT lang, source,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
        |    CAST(sum(length(text)) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY 1, 2),
        | u AS (SELECT lang, source, CAST(count(DISTINCT w) AS BIGINT) AS distinct_tokens
        |  FROM (SELECT lang, source, unnest(string_split(text,' ')) AS w
        |        FROM documents) x
        |  GROUP BY 1, 2)
        |SELECT d.lang, d.source, n_docs, total_tokens, total_chars,
        | CAST(COALESCE(distinct_tokens, 0) AS BIGINT) AS distinct_tokens,
        | CAST(total_tokens AS DOUBLE)/n_docs AS avg_doc_tokens
        |FROM d LEFT JOIN u ON d.lang IS NOT DISTINCT FROM u.lang
        |             AND d.source IS NOT DISTINCT FROM u.source""".stripMargin,
    // line-level boilerplate removal: a line in ≥2 distinct docs is
    // dropped everywhere; clean text rebuilt in original line order
    // (string_agg ORDER BY pos skips NULLed boilerplate lines, mirroring
    // collect_list's null-skipping)
    "text_line_dedup" ->
      """WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |     unnest(range(0, len(string_split(text, chr(10))))) AS pos FROM documents),
        | b AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS nd
        |        FROM l GROUP BY line) t WHERE nd >= 2),
        | k AS (SELECT doc_id, pos, line,
        |        line IN (SELECT line FROM b) AS boiler FROM l)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        | CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler_lines,
        | COALESCE(string_agg(CASE WHEN NOT boiler THEN line END, chr(10) ORDER BY pos), '')
        |   AS clean_text
        |FROM k GROUP BY doc_id""".stripMargin,
    // tf-idf key terms: integer idf surrogate (n_docs*1000 // df), ties
    // by term ascending; oracle ranks with a window (the engine uses a
    // bounded per-doc sort instead — the VALUES must agree)
    "text_keyterms" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        | nd AS (SELECT count(*) AS n_docs FROM d),
        | tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM d),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |   WHERE term <> '' GROUP BY 1, 2),
        | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | sc AS (SELECT t.doc_id, t.term, t.tf, f.df,
        |     t.tf * ((nd.n_docs * 1000) // f.df) AS score
        |   FROM tf t JOIN df f USING (term) CROSS JOIN nd),
        | rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |     ORDER BY score DESC, term) AS rank FROM sc)
        |SELECT doc_id, rank, term, tf, df, score FROM rk
        |WHERE rank <= 3""".stripMargin,
    // intra-doc repetition: totals/distincts are integers; the duplicate
    // fraction is one per-row IEEE subtract+divide, bit-stable cross-engine
    "text_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        | g AS (SELECT doc_id,
        |   list_filter(list_transform(ws, (x,i) ->
        |     CASE WHEN i+1 <= len(ws) THEN array_to_string(list_slice(ws, i, i+1), ' ') END),
        |     s -> s IS NOT NULL) AS bi,
        |   list_filter(list_transform(ws, (x,i) ->
        |     CASE WHEN i+2 <= len(ws) THEN array_to_string(list_slice(ws, i, i+2), ' ') END),
        |     s -> s IS NOT NULL) AS tri
        |  FROM d)
        |SELECT doc_id,
        | CAST(len(bi) AS INTEGER) AS bi_total,
        | CAST(len(list_distinct(bi)) AS INTEGER) AS bi_distinct,
        | CASE WHEN len(bi) > 0
        |   THEN CAST(1 AS DOUBLE) - CAST(len(list_distinct(bi)) AS DOUBLE) / CAST(len(bi) AS DOUBLE)
        |   ELSE 0.0 END AS bi_dup_frac,
        | CAST(len(tri) AS INTEGER) AS tri_total,
        | CAST(len(list_distinct(tri)) AS INTEGER) AS tri_distinct,
        | CASE WHEN len(tri) > 0
        |   THEN CAST(1 AS DOUBLE) - CAST(len(list_distinct(tri)) AS DOUBLE) / CAST(len(tri) AS DOUBLE)
        |   ELSE 0.0 END AS tri_dup_frac
        |FROM g""".stripMargin,
    // deterministic stratified sampling: the LCG coin is generated from
    // the SAME Scala constants the operator uses (Dedup.HashA/B(0))
    "text_sample" -> {
      import graft.operators.Dedup.{HashA, HashB}
      s"""WITH d AS (SELECT doc_id,
         |   CASE WHEN len(string_split(text,' ')) < 50 THEN 'short' ELSE 'long' END AS stratum,
         |   ((${HashA(0)}*doc_id + ${HashB(0)}) % $P) % 1000 AS coin
         | FROM documents)
         |SELECT doc_id, stratum, coin FROM d
         |WHERE coin < CASE stratum WHEN 'short' THEN 250 ELSE 750 END""".stripMargin
    },
    "text_decontam" -> decontamSql,
    // the Bloom-prefiltered form is contract-identical to text_decontam;
    // checking BOTH against one oracle SQL is the losslessness proof
    "text_decontam_bloom" -> decontamSql,
    // exact-k per-stratum sample: the oracle is the naive full-table
    // window; the Spark side ranks only pre-thinned survivors (plus the
    // provable per-stratum fallback), so a hash match proves the
    // threshold construction exact. Coin = LCG family index 3 (plain %
    // mirrors pmod on this table's non-negative ids).
    "text_sample_topk" -> {
      import graft.operators.Dedup.{HashA, HashB}
      s"""SELECT lang AS stratum, doc_id, rn FROM (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY (${HashA(3)}*doc_id + ${HashB(3)}) % $P, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 50""".stripMargin
    },
    // A-ES weighted exact-k: priority = hash // weight (token count,
    // clamped >= 1), min-8 per language by (priority, id)
    "text_sample_weighted" -> {
      import graft.operators.Dedup.{HashA, HashB}
      s"""SELECT lang AS stratum, doc_id, rn FROM (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ((${HashA(5)}*doc_id + ${HashB(5)}) % $P) //
         |        greatest(1, coalesce(len(string_split(text,' ')), 0)),
         |        doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 8""".stripMargin
    },
    "kg_edge_rollup" ->
      s"""SELECT subj, pred, obj, count(*) AS n_docs, min(doc_id) AS first_doc
         |FROM ($kgTriplesSql) GROUP BY subj, pred, obj""".stripMargin,
    // incremental rollup maintenance and streaming construction both
    // hash-match the FULL-RECOMPUTE batch rollup — merged-delta == full
    // and stream == batch, each proven by the independent engine
    "kg_edge_rollup_delta" ->
      s"""SELECT subj, pred, obj, count(*) AS n_docs, min(doc_id) AS first_doc
         |FROM ($kgTriplesSql) GROUP BY subj, pred, obj""".stripMargin,
    "kg_stream_edges" ->
      s"""SELECT subj, pred, obj, count(*) AS n_docs, min(doc_id) AS first_doc
         |FROM ($kgTriplesSql) GROUP BY subj, pred, obj""".stripMargin,
    // per-node degree + doc support over the symmetrized edge rollup;
    // count(DISTINCT nb) mirrors countDistinct (robust to multi-pred)
    "kg_node_degrees" ->
      s"""WITH er AS (SELECT subj, obj, count(*) AS n_docs
         |  FROM ($kgTriplesSql) GROUP BY subj, pred, obj),
         | sym AS (SELECT subj AS node, obj AS nb, n_docs FROM er
         |   UNION ALL SELECT obj, subj, n_docs FROM er)
         |SELECT node, count(DISTINCT nb) AS degree,
         |  CAST(sum(n_docs) AS BIGINT) AS doc_support
         |FROM sym GROUP BY node""".stripMargin,
    // integer fixed-point PageRank, the SAME recurrence GraphOps.pageRank
    // runs, unrolled as 5 CTE steps (the Lloyd-iteration precedent):
    // ranks in parts-per-1e12, damping 850000 ppm, r0 = scale div N,
    // base = r0*150000 div 1e6, r'(v) = base + 850000*sum(r div od) div
    // 1e6. All-integer ops — `//` == Spark `div` on positives; the sum is
    // HUGEINT in DuckDB, cast back to BIGINT before the multiply.
    "kg_pagerank" -> {
      val steps = (1 to 5).map { i =>
        s""" r$i AS (SELECT sym.dst AS node,
           |   ((1000000000000 // n.cnt) * 150000) // 1000000
           |     + (850000 * CAST(sum(p.r // deg.od) AS BIGINT)) // 1000000 AS r
           |  FROM sym JOIN r${i - 1} p ON sym.src = p.node
           |  JOIN deg ON sym.src = deg.src CROSS JOIN n
           |  GROUP BY sym.dst, n.cnt)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT subj AS src, obj AS dst FROM ($kgTriplesSql)),
         | sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         | deg AS (SELECT src, count(*) AS od FROM sym GROUP BY src),
         | n AS (SELECT count(*) AS cnt FROM deg),
         | r0 AS (SELECT src AS node, 1000000000000 // cnt AS r
         |        FROM deg CROSS JOIN n),
         |$steps
         |SELECT node, r AS rank_ppt FROM r5""".stripMargin
    },
    // distributed min-label CC over the entity graph vs the recursive
    // min-label CTE (the keep-list closure pattern, entity-string labels:
    // byte-order min is identical across engines for ASCII names)
    "kg_components" ->
      s"""WITH RECURSIVE e0 AS (SELECT DISTINCT subj AS a, obj AS b FROM ($kgTriplesSql)),
         | sym AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
         | lp AS (SELECT DISTINCT a AS node, a AS label FROM sym
         |        UNION
         |        SELECT s.b AS node, lp.label FROM lp JOIN sym s ON s.a = lp.node)
         |SELECT node, min(label) AS component FROM lp GROUP BY node""".stripMargin,
    // triangle counts: the oracle enumerates the NAIVE a<b<c way; the
    // engine enumerates degree-ordered (compact-forward) — the triangle
    // set is orientation-invariant, so a hash match proves the optimized
    // plan exact
    "kg_triangles" ->
      s"""WITH e0 AS (SELECT DISTINCT subj AS a, obj AS b FROM ($kgTriplesSql)),
         | sym AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
         | syn AS (SELECT a, b FROM sym WHERE a <> b),
         | ord1 AS (SELECT a, b FROM syn WHERE a < b),
         | tri AS (SELECT x.a AS u, x.b AS v, y.b AS w
         |         FROM ord1 x JOIN ord1 y ON y.a = x.b
         |         JOIN ord1 z ON z.a = x.a AND z.b = y.b),
         | corners AS (SELECT u AS node FROM tri UNION ALL
         |             SELECT v FROM tri UNION ALL SELECT w FROM tri),
         | nodes AS (SELECT DISTINCT a AS node FROM syn)
         |SELECT n.node, count(c.node) AS n_tri
         |FROM nodes n LEFT JOIN corners c ON n.node = c.node
         |GROUP BY n.node""".stripMargin,
    // shared-neighbor Jaccard at >= 0.2, all-integer (cross-multiplied
    // threshold, // == Spark div on positives)
    "kg_node_sim" ->
      s"""WITH e0 AS (SELECT DISTINCT subj AS a, obj AS b FROM ($kgTriplesSql)),
         | sym AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
         | deg AS (SELECT a AS n, count(*) AS d FROM sym GROUP BY a),
         | w AS (SELECT x.a AS node_a, y.a AS node_b, count(*) AS inter
         |       FROM sym x JOIN sym y ON x.b = y.b AND x.a < y.a
         |       GROUP BY 1, 2)
         |SELECT node_a, node_b, inter, da.d + db.d - inter AS uni,
         |  (inter * 1000) // (da.d + db.d - inter) AS jac_permille
         |FROM w JOIN deg da ON node_a = da.n JOIN deg db ON node_b = db.n
         |WHERE inter * 1000 >= 200 * (da.d + db.d - inter)""".stripMargin,
    // multi-source BFS distances, seed = min entity, 4 hops — the oracle
    // unrolls the NAIVE whole-set recurrence d_i = min(d_{i-1} ∪ nb+1);
    // the engine's frontier loop must agree exactly (BFS layers are the
    // anti-join's admitted rows)
    "kg_khop" -> {
      val steps = (1 to 4).map { i =>
        s""" d$i AS (SELECT node, min(dist) AS dist FROM (
           |   SELECT node, dist FROM d${i - 1}
           |   UNION ALL
           |   SELECT s.b AS node, p.dist + 1 AS dist
           |   FROM d${i - 1} p JOIN sym s ON s.a = p.node) GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT subj AS a, obj AS b FROM ($kgTriplesSql)),
         | sym AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
         | d0 AS (SELECT min(a) AS node, 0 AS dist FROM sym),
         |$steps
         |SELECT node, dist FROM d4""".stripMargin
    },
    // 3 rounds of synchronous label propagation: per-round windowed argmax
    // (count DESC, label ASC) vs the engine's window-free
    // min(struct(-count, label)) — identical total order
    "kg_communities" -> {
      val steps = (1 to 3).map { i =>
        s""" c$i AS (SELECT s.b AS node, l.label, count(*) AS c
           |   FROM l${i - 1} l JOIN sym s ON s.a = l.node GROUP BY 1, 2),
           | l$i AS (SELECT node, label FROM c$i
           |   QUALIFY row_number() OVER (
           |     PARTITION BY node ORDER BY c DESC, label) = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT subj AS a, obj AS b FROM ($kgTriplesSql)),
         | sym0 AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
         | sym AS (SELECT a, b FROM sym0 WHERE a <> b),
         | l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),
         |$steps
         |SELECT node, label FROM l3""".stripMargin
    },
    // entity resolution: neighbor-Jaccard >= 0.5 edges -> recursive
    // min-label closure -> every KG node with its merge id (itself when
    // no edge qualifies)
    "kg_entity_merge" ->
      s"""WITH RECURSIVE e0 AS (SELECT DISTINCT subj AS a, obj AS b FROM ($kgTriplesSql)),
         | sym AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
         | deg AS (SELECT a AS n, count(*) AS d FROM sym GROUP BY a),
         | w AS (SELECT x.a AS node_a, y.a AS node_b, count(*) AS inter
         |       FROM sym x JOIN sym y ON x.b = y.b AND x.a < y.a
         |       GROUP BY 1, 2),
         | me0 AS (SELECT node_a, node_b
         |   FROM w JOIN deg da ON node_a = da.n JOIN deg db ON node_b = db.n
         |   WHERE inter * 1000 >= 500 * (da.d + db.d - inter)),
         | msym AS (SELECT node_a AS a, node_b AS b FROM me0
         |          UNION SELECT node_b, node_a FROM me0),
         | lp AS (SELECT DISTINCT a AS node, a AS label FROM msym
         |        UNION
         |        SELECT s.b AS node, lp.label FROM lp JOIN msym s ON s.a = lp.node),
         | canon AS (SELECT node, min(label) AS merge_id FROM lp GROUP BY node),
         | nodes AS (SELECT DISTINCT a AS node FROM sym)
         |SELECT n.node, coalesce(c.merge_id, n.node) AS merge_id
         |FROM nodes n LEFT JOIN canon c ON n.node = c.node""".stripMargin,
    // ER candidate generation: distinct part names + support, token
    // blocking with the frequency cap (<= 100 keeps all 16 tokens here),
    // pair dedup counting shared blocking tokens, levenshtein verify
    "kg_er_candidates" ->
      """WITH n AS (SELECT p_name AS name, count(*) AS n_ids FROM part
        |   WHERE p_name IS NOT NULL GROUP BY 1),
        | tok AS (SELECT DISTINCT name, tok FROM (
        |   SELECT name, unnest(string_split(name, ' ')) AS tok FROM n)
        |   WHERE tok <> ''),
        | keep AS (SELECT tok FROM (
        |   SELECT tok, count(*) AS c FROM tok GROUP BY 1) WHERE c <= 100),
        | bl AS (SELECT t.name, t.tok FROM tok t JOIN keep USING (tok)),
        | pairs AS (SELECT a.name AS name_a, b.name AS name_b,
        |     count(*) AS n_shared_tokens
        |   FROM bl a JOIN bl b ON a.tok = b.tok AND a.name < b.name
        |   GROUP BY 1, 2)
        |SELECT name_a, name_b,
        |  levenshtein(name_a, name_b) AS edit_dist, n_shared_tokens,
        |  na.n_ids AS n_ids_a, nb.n_ids AS n_ids_b
        |FROM pairs JOIN n na ON na.name = name_a
        |JOIN n nb ON nb.name = name_b
        |WHERE levenshtein(name_a, name_b) <= 2""".stripMargin,
    // edge association lift in ppm: n_ab·N·1e6 // (n_a·n_b) — all-integer
    // PMI core; per-entity doc supports reuse the mentions predicate
    "kg_lift" -> {
      val perSurface = Queries.kgDictWords.map(w =>
        s"""SELECT '$w' AS surface, count(*) AS nd FROM documents
           |WHERE (length(text) - length(replace(text, '$w', ''))) / ${w.length} > 0"""
          .stripMargin).mkString("\nUNION ALL\n")
      s"""WITH er AS MATERIALIZED (SELECT subj, pred, obj, count(*) AS n_ab
         |   FROM ($kgTriplesSql) GROUP BY subj, pred, obj),
         | nd AS MATERIALIZED ($perSurface),
         | n AS (SELECT count(*) AS n_total FROM documents)
         |SELECT subj, pred, obj, n_ab, a.nd AS n_a, b.nd AS n_b,
         |  (n_ab * n_total * 1000000) // (a.nd * b.nd) AS lift_ppm
         |FROM er JOIN nd a ON er.subj = a.surface
         |JOIN nd b ON er.obj = b.surface CROSS JOIN n""".stripMargin
    },
    // typed extraction: relation label = co-present predicate verb
    "kg_typed_triples" ->
      s"WITH $kgTypedCtes\nSELECT doc_id, subj, pred, obj FROM t",
    // predicate schema induction: distinct-edge counts, integer
    // functionality ratios, modal domain/range types (count DESC, type ASC
    // — the engine's min(struct(-count, type)) total order)
    "kg_pred_stats" ->
      s"""WITH $kgTypedCtes,
         | e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM t),
         | et AS MATERIALIZED (SELECT pred, ${entityTypeSql("subj")} AS stype,
         |        ${entityTypeSql("obj")} AS otype FROM e),
         | base AS (SELECT pred, count(*) AS n_triples,
         |          count(DISTINCT doc_id) AS n_docs FROM t GROUP BY pred),
         | ed AS (SELECT pred, count(*) AS n_edges,
         |        count(DISTINCT subj) AS n_subj,
         |        count(DISTINCT obj) AS n_obj FROM e GROUP BY pred),
         | dc AS (SELECT pred, stype, count(*) AS c FROM et GROUP BY 1, 2),
         | dom AS (SELECT pred, stype AS domain_type FROM dc
         |   QUALIFY row_number() OVER (
         |     PARTITION BY pred ORDER BY c DESC, stype) = 1),
         | rc AS (SELECT pred, otype, count(*) AS c FROM et GROUP BY 1, 2),
         | rng AS (SELECT pred, otype AS range_type FROM rc
         |   QUALIFY row_number() OVER (
         |     PARTITION BY pred ORDER BY c DESC, otype) = 1)
         |SELECT pred, n_triples, n_docs, n_edges, n_subj, n_obj,
         |  (n_subj * 1000) // n_edges AS functionality_permille,
         |  (n_obj * 1000) // n_edges AS inv_functionality_permille,
         |  domain_type, range_type
         |FROM base JOIN ed USING (pred) JOIN dom USING (pred)
         |JOIN rng USING (pred)""".stripMargin,
    // length-2 meta-path census over the distinct typed edge set
    "kg_metapaths" ->
      s"""WITH $kgTypedCtes,
         | e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM t)
         |SELECT a.pred AS pred_a, b.pred AS pred_b, count(*) AS n_paths,
         |  count(DISTINCT a.obj) AS n_mid
         |FROM e a JOIN e b ON a.obj = b.subj GROUP BY 1, 2""".stripMargin,
    // LCG corrupted-object negatives over the SHIPPED (support-
    // thresholded) edge set, anti-joined against that same set under the
    // canonical (dictionary-rank) pair orientation — the thresholded
    // closed-world assumption (below-threshold edges are noise, so a
    // corruption landing on one is a genuine negative)
    "kg_negatives" -> {
      val idx = "((first_doc * 1103515245 + n_docs * 12345 + 7) " +
        s"% 2147483647) % ${Queries.kgDictWords.length}"
      val negCase = "CASE " + Queries.kgDictWords.zipWithIndex.map {
        case (w, i) => s"WHEN idx = $i THEN '$w'" }.mkString(" ") + " END"
      s"""WITH $kgTypedCtes,
         | roll AS MATERIALIZED (SELECT subj, pred, obj, count(*) AS n_docs,
         |   min(doc_id) AS first_doc FROM t GROUP BY 1, 2, 3),
         | pm AS (SELECT pred, max(n_docs) AS pmax FROM roll GROUP BY 1),
         | ship AS MATERIALIZED (SELECT r.* FROM roll r JOIN pm USING (pred)
         |   WHERE r.n_docs * 1000 >= ${Queries.kgShipPermille} * pm.pmax),
         | ix AS (SELECT subj, pred, obj, $idx AS idx FROM ship),
         | cand AS (SELECT subj, pred, obj, $negCase AS neg_obj FROM ix),
         | canon AS (SELECT subj, pred, obj, neg_obj,
         |   CASE WHEN ${dictRankSql("subj")} < ${dictRankSql("neg_obj")}
         |        THEN subj ELSE neg_obj END AS can_s,
         |   CASE WHEN ${dictRankSql("subj")} < ${dictRankSql("neg_obj")}
         |        THEN neg_obj ELSE subj END AS can_o
         |   FROM cand WHERE neg_obj <> subj AND neg_obj <> obj)
         |SELECT subj, pred, obj, neg_obj FROM canon c
         |WHERE NOT EXISTS (SELECT 1 FROM ship r
         |  WHERE r.subj = c.can_s AND r.pred = c.pred AND r.obj = c.can_o)"""
        .stripMargin
    },
    // bounded per-edge provenance: the k=3 exemplar docs per edge, plain
    // ROW_NUMBER form — proves the O(k) pre-thinned plan exact
    "kg_provenance" -> {
      import graft.operators.Dedup.{HashA, HashB}
      s"""WITH tr AS MATERIALIZED ($kgTriplesSql)
         |SELECT subj, pred, obj, doc_id, rn FROM (
         |  SELECT subj, pred, obj, doc_id,
         |    row_number() OVER (PARTITION BY subj, pred, obj
         |      ORDER BY (${HashA(3)}*doc_id + ${HashB(3)}) % $P, doc_id) AS rn
         |  FROM tr)
         |WHERE rn <= 3""".stripMargin
    },
    // Horn rule mining: distinct body groundings, head closures, integer
    // CWA confidence — (x,y) is already canonical because extraction
    // orders edges by dictionary rank, so the head probe is an equi-join
    "kg_rules" ->
      s"""WITH $kgTypedCtes,
         | e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM t),
         | paths AS MATERIALIZED (SELECT DISTINCT a.pred AS pred_a,
         |   b.pred AS pred_b, a.subj AS x, b.obj AS y
         |   FROM e a JOIN e b ON a.obj = b.subj),
         | np AS (SELECT pred_a, pred_b, count(*) AS n_pairs FROM paths
         |   GROUP BY 1, 2),
         | cl AS (SELECT p.pred_a, p.pred_b, h.pred AS pred_head,
         |   count(*) AS n_closed
         |   FROM paths p JOIN e h ON h.subj = p.x AND h.obj = p.y
         |   GROUP BY 1, 2, 3)
         |SELECT pred_a, pred_b, pred_head, n_pairs, n_closed,
         |  (n_closed * 1000) // n_pairs AS conf_permille
         |FROM cl JOIN np USING (pred_a, pred_b)""".stripMargin,
    // rule mining over the edge set AUGMENTED with its inversions
    // (pred^-1, subj/obj swapped) — the same mining CTEs; inverse heads
    // are restatements and drop
    "kg_rules_inverse" ->
      s"""WITH $kgTypedCtes,
         | e0 AS (SELECT DISTINCT subj, pred, obj FROM t),
         | e AS MATERIALIZED (SELECT subj, pred, obj FROM e0
         |   UNION ALL SELECT obj, pred || '^-1', subj FROM e0),
         | paths AS MATERIALIZED (SELECT DISTINCT a.pred AS pred_a,
         |   b.pred AS pred_b, a.subj AS x, b.obj AS y
         |   FROM e a JOIN e b ON a.obj = b.subj),
         | np AS (SELECT pred_a, pred_b, count(*) AS n_pairs FROM paths
         |   GROUP BY 1, 2),
         | cl AS (SELECT p.pred_a, p.pred_b, h.pred AS pred_head,
         |   count(*) AS n_closed
         |   FROM paths p JOIN e h ON h.subj = p.x AND h.obj = p.y
         |   GROUP BY 1, 2, 3)
         |SELECT pred_a, pred_b, pred_head, n_pairs, n_closed,
         |  (n_closed * 1000) // n_pairs AS conf_permille
         |FROM cl JOIN np USING (pred_a, pred_b)
         |WHERE pred_head NOT LIKE '%^-1'""".stripMargin,
    // SPARQL-style BGP over the typed KG: the closed length-2 path
    // pattern { ?x filter ?m . ?m group ?y . ?x scan ?y } as plain
    // three-way self-join — proves the greedy join-order compiler exact
    "kg_bgp" ->
      s"""WITH $kgTypedCtes,
         | e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM t)
         |SELECT a.subj AS x, a.obj AS m, b.obj AS y
         |FROM e a JOIN e b ON b.subj = a.obj
         |JOIN e c ON c.subj = a.subj AND c.obj = b.obj
         |WHERE a.pred = 'filter' AND b.pred = 'group'
         |  AND c.pred = 'scan'""".stripMargin,
    // BGP solution-level FILTER: the x-anchored filter/scan star with the
    // m <> y inequality constraint
    "kg_bgp_filter" ->
      s"""WITH $kgTypedCtes,
         | e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM t)
         |SELECT a.subj AS x, a.obj AS m, b.obj AS y
         |FROM e a JOIN e b ON b.subj = a.subj
         |WHERE a.pred = 'filter' AND b.pred = 'scan'
         |  AND a.obj <> b.obj""".stripMargin,
    // BGP UNION (bag semantics): direct merge edges, with m unbound, plus
    // 2-hop filter->scan chains binding m
    "kg_bgp_union" ->
      s"""WITH $kgTypedCtes,
         | e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM t)
         |SELECT subj AS x, obj AS y, CAST(NULL AS VARCHAR) AS m
         |FROM e WHERE pred = 'merge'
         |UNION ALL
         |SELECT a.subj AS x, b.obj AS y, a.obj AS m
         |FROM e a JOIN e b ON b.subj = a.obj
         |WHERE a.pred = 'filter' AND b.pred = 'scan'""".stripMargin,
    // SPARQL VALUES: the filter-pattern solutions joined with an inline
    // binding table (restricts ?x, extends with the payload column)
    "kg_bgp_values" ->
      s"""WITH $kgTypedCtes,
         | e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM t),
         | v(x, grp) AS (VALUES ('customer', 'alpha'), ('part', 'alpha'),
         |   ('vector', 'beta'))
         |SELECT a.subj AS x, a.obj AS m, v.grp
         |FROM e a JOIN v ON v.x = a.subj
         |WHERE a.pred = 'filter'""".stripMargin,
    // SPARQL MINUS: anti-join on the shared variables — filter pairs with
    // no parallel scan edge, over the training split (the saturated full
    // graph would subtract everything)
    "kg_bgp_minus" ->
      s"""WITH $kgTypedCtes,
         | fe AS (SELECT DISTINCT subj, pred, obj FROM t),
         | e AS MATERIALIZED (SELECT * FROM fe
         |   WHERE ($edgeSplitSql) % 4 <> 3)
         |SELECT a.subj AS x, a.obj AS m FROM e a
         |WHERE a.pred = 'filter' AND NOT EXISTS (
         |  SELECT 1 FROM e s WHERE s.pred = 'scan'
         |    AND s.subj = a.subj AND s.obj = a.obj)""".stripMargin,
    // mined-rule application: the miner's gated output applied wholesale
    // — chain groundings joined with the gated rule table, best-conf per
    // predicted edge, NOT EXISTS against the observed set. The mining
    // CTEs are the kg_rules SQL verbatim; gates come from the SAME Scala
    // constants the engine applies (Queries.RuleConfGatePermille/MinPairs)
    "kg_rule_apply" ->
      s"""WITH $kgTypedCtes,
         | fe AS (SELECT DISTINCT subj, pred, obj FROM t),
         | e AS MATERIALIZED (SELECT * FROM fe
         |   WHERE ($edgeSplitSql) % 4 <> 3),
         |${minedRuleCtes("e")}
         |SELECT subj, pred, obj, conf_permille FROM predicted p
         |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.subj = p.subj
         |  AND e.pred = p.pred AND e.obj = p.obj)""".stripMargin,
    // held-out completion eval: mine + apply on the training 3/4 of the
    // distinct edge set (the word-soup corpus saturates the closed-
    // vocabulary KG, so the split must be edge-level, not doc-level),
    // score inferred edges against the held-out quarter — one row of
    // counts + permille precision/recall
    "kg_completion_eval" ->
      s"""WITH $kgTypedCtes,
         | fe AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM t),
         | e AS MATERIALIZED (SELECT * FROM fe
         |   WHERE ($edgeSplitSql) % 4 <> 3),
         | held AS MATERIALIZED (SELECT * FROM fe
         |   WHERE ($edgeSplitSql) % 4 = 3),
         |${minedRuleCtes("e")},
         | inferred AS MATERIALIZED (
         |   SELECT subj, pred, obj FROM predicted p
         |   WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.subj = p.subj
         |     AND e.pred = p.pred AND e.obj = p.obj)),
         | c AS (SELECT (SELECT count(*) FROM inferred) AS n_inferred,
         |   (SELECT count(*) FROM held) AS n_heldout,
         |   (SELECT count(*) FROM inferred JOIN held
         |      USING (subj, pred, obj)) AS n_hit)
         |SELECT n_inferred, n_heldout, n_hit,
         |  CASE WHEN n_inferred = 0 THEN 0
         |    ELSE (n_hit * 1000) // n_inferred END AS precision_permille,
         |  CASE WHEN n_heldout = 0 THEN 0
         |    ELSE (n_hit * 1000) // n_heldout END AS recall_permille
         |FROM c""".stripMargin,
    // rule application / SPARQL CONSTRUCT: the rule body's distinct
    // groundings anti-joined against observed head edges — the inferred
    // KG-completion candidates
    // training-split edges only (see Queries.kgRuleInfer: the saturated
    // closed-vocabulary KG makes the full-graph anti-join vacuously empty)
    "kg_rule_infer" ->
      s"""WITH $kgTypedCtes,
         | fe AS (SELECT DISTINCT subj, pred, obj FROM t),
         | e AS MATERIALIZED (SELECT * FROM fe
         |   WHERE ($edgeSplitSql) % 4 <> 3),
         | body AS (SELECT DISTINCT a.subj AS x, b.obj AS y
         |   FROM e a JOIN e b ON b.subj = a.obj
         |   WHERE a.pred = 'filter' AND b.pred = 'group')
         |SELECT x AS subj, 'scan' AS pred, y AS obj FROM body
         |WHERE NOT EXISTS (SELECT 1 FROM e h
         |  WHERE h.subj = body.x AND h.pred = 'scan' AND h.obj = body.y)"""
        .stripMargin,
    // incremental inference maintenance hash-matches the FULL-RECOMPUTE
    // CONSTRUCT over the same training graph — semi-naive delta == full,
    // proven by the independent engine (the kg_edge_rollup_delta protocol
    // extended from aggregation to reasoning)
    "kg_rule_infer_delta" ->
      s"""WITH $kgTypedCtes,
         | fe AS (SELECT DISTINCT subj, pred, obj FROM t),
         | e AS MATERIALIZED (SELECT * FROM fe
         |   WHERE ($edgeSplitSql) % 4 <> 3),
         | body AS (SELECT DISTINCT a.subj AS x, b.obj AS y
         |   FROM e a JOIN e b ON b.subj = a.obj
         |   WHERE a.pred = 'filter' AND b.pred = 'group')
         |SELECT x AS subj, 'scan' AS pred, y AS obj FROM body
         |WHERE NOT EXISTS (SELECT 1 FROM e h
         |  WHERE h.subj = body.x AND h.pred = 'scan' AND h.obj = body.y)"""
        .stripMargin,
    // BGP with an OPTIONAL group: LEFT JOIN twin of the engine's
    // optional-pattern compiler path (unmatched -> NULL z)
    "kg_bgp_optional" ->
      s"""WITH $kgTypedCtes,
         | e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM t)
         |SELECT a.subj AS x, a.obj AS m, b.obj AS z
         |FROM e a LEFT JOIN e b
         |  ON b.subj = a.obj AND b.pred = 'merge'
         |WHERE a.pred = 'filter'""".stripMargin,
    // RDFS type materialization: direct dictionary types (hops 0) +
    // supertypes through the subclass closure (recursive CTE over the
    // same literal hierarchy)
    "kg_inferred_types" -> {
      val subVals = Queries.kgSubclassEdges
        .map { case (a, b) => s"('$a', '$b')" }.mkString(", ")
      s"""WITH RECURSIVE $kgTypedCtes,
         | ents AS MATERIALIZED (SELECT DISTINCT entity FROM (
         |   SELECT subj AS entity FROM t UNION ALL SELECT obj FROM t)),
         | direct AS MATERIALIZED (SELECT entity,
         |   ${entityTypeSql("entity")} AS rdf_type, 0 AS hops FROM ents),
         | sub(src, dst) AS (VALUES $subVals),
         | cl AS (SELECT src, dst, 1 AS d FROM sub
         |   UNION
         |   SELECT cl.src, sub.dst, cl.d + 1 FROM cl
         |   JOIN sub ON sub.src = cl.dst WHERE cl.d < 4),
         | clm AS (SELECT src, dst, min(d) AS dist FROM cl GROUP BY 1, 2)
         |SELECT entity, rdf_type, hops FROM direct
         |UNION ALL
         |SELECT d.entity, c.dst AS rdf_type, c.dist AS hops
         |FROM direct d JOIN clm c ON c.src = d.rdf_type""".stripMargin
    },
    // property-path closure filter+: naive depth-capped recursive CTE
    // aggregated to min hop count — proves the engine's semi-naive
    // frontier pruning lossless
    "kg_path_closure" ->
      s"""WITH RECURSIVE $kgTypedCtes,
         | e AS MATERIALIZED (SELECT DISTINCT subj AS src, obj AS dst
         |   FROM t WHERE pred = 'filter'),
         | r AS (SELECT src, dst, 1 AS d FROM e
         |   UNION
         |   SELECT r.src, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.dst
         |   WHERE r.d < 4)
         |SELECT src, dst, min(d) AS dist FROM r GROUP BY 1, 2"""
        .stripMargin,
    // schema-violation audit: edges deviating from the induced modal
    // domain/range (same dom/rng CTEs as kg_pred_stats)
    "kg_schema_viol" ->
      s"""WITH $kgTypedCtes,
         | e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM t),
         | et AS MATERIALIZED (SELECT subj, pred, obj,
         |   ${entityTypeSql("subj")} AS stype,
         |   ${entityTypeSql("obj")} AS otype FROM e),
         | dc AS (SELECT pred, stype, count(*) AS c FROM et GROUP BY 1, 2),
         | dom AS (SELECT pred, stype AS domain_type FROM dc
         |   QUALIFY row_number() OVER (
         |     PARTITION BY pred ORDER BY c DESC, stype) = 1),
         | rc AS (SELECT pred, otype, count(*) AS c FROM et GROUP BY 1, 2),
         | rng AS (SELECT pred, otype AS range_type FROM rc
         |   QUALIFY row_number() OVER (
         |     PARTITION BY pred ORDER BY c DESC, otype) = 1)
         |SELECT subj, pred, obj, stype, otype, domain_type, range_type,
         |  CASE WHEN stype <> domain_type THEN 1 ELSE 0 END AS domain_viol,
         |  CASE WHEN otype <> range_type THEN 1 ELSE 0 END AS range_viol
         |FROM et JOIN dom USING (pred) JOIN rng USING (pred)
         |WHERE stype <> domain_type OR otype <> range_type""".stripMargin,
    // edge-level snapshot diff between the doc-parity halves: full-outer
    // on the edge key, support coalesced to 0, added/removed/changed/same
    "kg_edge_diff" ->
      s"""WITH tr AS MATERIALIZED ($kgTriplesSql),
         | o AS MATERIALIZED (SELECT subj, pred, obj, count(*) AS n FROM tr
         |   WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
         | nn AS MATERIALIZED (SELECT subj, pred, obj, count(*) AS n FROM tr
         |   WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3)
         |SELECT subj, pred, obj,
         |  coalesce(o.n, 0) AS n_docs_old, coalesce(nn.n, 0) AS n_docs_new,
         |  coalesce(nn.n, 0) - coalesce(o.n, 0) AS delta,
         |  CASE WHEN coalesce(o.n, 0) = 0 THEN 'added'
         |       WHEN coalesce(nn.n, 0) = 0 THEN 'removed'
         |       WHEN nn.n <> o.n THEN 'changed' ELSE 'same' END AS status
         |FROM o FULL JOIN nn USING (subj, pred, obj)""".stripMargin,
    // N-Triples lines: IRI statement + typed-integer provenance literal
    "kg_ntriples" ->
      s"""WITH er AS (SELECT subj, pred, obj, count(*) AS n_docs
         |   FROM ($kgTriplesSql) GROUP BY 1, 2, 3)
         |SELECT subj, pred, obj, n_docs,
         |  '<urn:graft:e:' || subj || '> <urn:graft:p:' || pred ||
         |    '> <urn:graft:e:' || obj || '> .' AS stmt,
         |  '<urn:graft:x:' || subj || ':' || pred || ':' || obj ||
         |    '> <urn:graft:p:n_docs> "' || CAST(n_docs AS VARCHAR) ||
         |    '"^^<http://www.w3.org/2001/XMLSchema#integer> .' AS prov
         |FROM er""".stripMargin,
    // 6 unrolled peeling rounds toward the 10-core of the user graph —
    // MATERIALIZED per step (the chained CTEs would otherwise inline
    // exponentially); the engine's stability short-circuit equals the
    // full unroll by construction
    "user_kcore" -> {
      val steps = (1 to 6).map { i =>
        s""" d$i AS MATERIALIZED (SELECT src, count(*) AS c FROM s${i - 1} GROUP BY src),
           | k$i AS MATERIALIZED (SELECT src FROM d$i WHERE c >= 10),
           | s$i AS MATERIALIZED (SELECT s.src, s.dst FROM s${i - 1} s
           |   JOIN k$i a ON s.src = a.src JOIN k$i b ON s.dst = b.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH $userSymSql,
         | s0 AS MATERIALIZED (SELECT src, dst FROM sym),
         |$steps
         |SELECT src AS node, count(*) AS deg FROM s6 GROUP BY src""".stripMargin
    },
    // 3-round ANF bottom-k sketches: per round UNION the neighbor
    // sketches and keep the 8 smallest hashes per node; estimate = exact
    // count under capacity, else the (k−1)·P // h_k KMV formula
    "user_nf" -> {
      import graft.operators.Dedup.{HashA, HashB, HashP}
      val steps = (1 to 3).map { i =>
        s""" nu$i AS (SELECT node, h FROM a${i - 1}
           |   UNION SELECT e.src AS node, t.h
           |   FROM sym e JOIN a${i - 1} t ON t.node = e.dst),
           | a$i AS MATERIALIZED (SELECT node, h FROM (
           |   SELECT node, h, row_number() OVER (
           |     PARTITION BY node ORDER BY h) AS rn FROM nu$i)
           |   WHERE rn <= 8)""".stripMargin
      }.mkString(",\n")
      s"""WITH $userSymSql,
         | a0 AS MATERIALIZED (SELECT DISTINCT src AS node,
         |   (${HashA(17)} * src + ${HashB(17)}) % $HashP AS h FROM sym),
         |$steps
         |SELECT node,
         |  CASE WHEN count(*) < 8 THEN count(*)
         |    ELSE (7 * $HashP) // max(h) END AS nf_est,
         |  count(*) AS sketch_size
         |FROM a3 GROUP BY node""".stripMargin
    },
    // sampled-source Brandes betweenness: BFS with exact path-count sums
    // unrolled 3 hops, then the backward dependency recurrence
    // σv·(10⁶ + δw) // σw level by level — the engine's fixed-point
    // arithmetic replayed term-for-term
    "user_betweenness" -> {
      val fwd = (1 to 3).map { r =>
        s""" nw$r AS MATERIALIZED (SELECT p.seed, s.dst AS node,
           |     $r AS dist, CAST(sum(p.sigma) AS BIGINT) AS sigma
           |   FROM ${if (r == 1) "st0" else s"nw${r - 1}"} p
           |   JOIN sym s ON s.src = p.node
           |   WHERE NOT EXISTS (SELECT 1 FROM st${r - 1} t
           |     WHERE t.seed = p.seed AND t.node = s.dst)
           |   GROUP BY p.seed, s.dst),
           | st$r AS MATERIALIZED (SELECT * FROM st${r - 1}
           |   UNION ALL SELECT * FROM nw$r)""".stripMargin
      }.mkString(",\n")
      val bwd = (2 to 0 by -1).map { l =>
        s""" d$l AS MATERIALIZED (SELECT v.seed, v.node,
           |     CAST(COALESCE(SUM((v.sigma * (1000000 + d.delta))
           |       // d.sigma), 0) AS BIGINT) AS delta, v.sigma
           |   FROM st3 v
           |   LEFT JOIN sym s ON s.src = v.node
           |   LEFT JOIN d${l + 1} d ON d.seed = v.seed AND d.node = s.dst
           |   WHERE v.dist = $l
           |   GROUP BY v.seed, v.node, v.sigma)""".stripMargin
      }.mkString(",\n")
      s"""WITH $userSymSql,
         | seeds AS (SELECT DISTINCT src AS node FROM sym
         |   WHERE src % 13 = 0),
         | st0 AS MATERIALIZED (SELECT node AS seed, node, 0 AS dist,
         |   CAST(1 AS BIGINT) AS sigma FROM seeds),
         |$fwd,
         | d3 AS MATERIALIZED (SELECT seed, node,
         |   CAST(0 AS BIGINT) AS delta, sigma FROM st3 WHERE dist = 3),
         |$bwd
         |SELECT node, CAST(sum(delta) AS BIGINT) AS bc_scaled,
         |  count(*) AS n_seeds
         |FROM (SELECT * FROM d0 UNION ALL SELECT * FROM d1
         |  UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3)
         |WHERE node <> seed GROUP BY node""".stripMargin
    },
    // Luby MIS, 6 unrolled rounds: per-round LCG priorities encoded as
    // one BIGINT (p·10⁷ + node), local-min winners, winner-neighbor
    // drops, isolated unconditional joins — the engine's exact protocol
    "user_mis" -> {
      import graft.operators.Dedup.{HashA, HashB, HashP}
      def enc(i: Int, c: String) =
        s"(((${HashA((9 + i) % 64)} * $c + ${HashB((9 + i) % 64)}) % $HashP)" +
          s" * 10000000 + $c)"
      val steps = (1 to 6).map { i =>
        s""" en$i AS (SELECT DISTINCT src AS node FROM c${i - 1}),
           | iso$i AS (SELECT node FROM u${i - 1}
           |   EXCEPT SELECT node FROM en$i),
           | nb$i AS (SELECT src AS node, min(${enc(i, "dst")}) AS m
           |   FROM c${i - 1} GROUP BY src),
           | win$i AS (SELECT node FROM nb$i WHERE ${enc(i, "node")} < m),
           | j$i AS MATERIALIZED (SELECT node FROM win$i
           |   UNION ALL SELECT node FROM iso$i),
           | los$i AS (SELECT DISTINCT dst AS node FROM c${i - 1} e
           |   JOIN win$i w ON e.src = w.node),
           | u$i AS MATERIALIZED (SELECT node FROM u${i - 1} EXCEPT
           |   (SELECT node FROM j$i UNION ALL SELECT node FROM los$i)),
           | c$i AS MATERIALIZED (SELECT e.src, e.dst FROM c${i - 1} e
           |   JOIN u$i a ON e.src = a.node JOIN u$i b ON e.dst = b.node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $userSymSql,
         | c0 AS MATERIALIZED (SELECT src, dst FROM sym),
         | u0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
         |$steps
         |${(1 to 6).map(i =>
             s"SELECT node, $i AS round FROM j$i").mkString("\nUNION ALL\n")}"""
        .stripMargin
    },
    // 4 unrolled 4-truss peeling rounds: per-edge support = naive
    // common-neighbor count inside the current set (the engine's
    // degree-ordered triangle credits equal it), peel support < 2;
    // output = the LAST round's supports filtered (the engine contract)
    "user_truss" -> {
      val steps = (1 to 4).map { i =>
        s""" sy$i AS MATERIALIZED (SELECT a, b FROM s${i - 1}
           |   UNION ALL SELECT b, a FROM s${i - 1}),
           | sup$i AS MATERIALIZED (SELECT e.a, e.b, count(*) AS sup
           |   FROM s${i - 1} e JOIN sy$i x ON x.a = e.a
           |     JOIN sy$i y ON y.a = e.b AND y.b = x.b
           |   GROUP BY e.a, e.b),
           | s$i AS MATERIALIZED (SELECT a, b FROM sup$i WHERE sup >= 2)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $userSymSql,
         | s0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM e0),
         |$steps
         |SELECT a AS src, b AS dst, sup AS support
         |FROM sup4 WHERE sup >= 2""".stripMargin
    },
    // 2 rounds of WL color refinement: signature = own color + ordered
    // (neighbor color : count) string, class id = min node id per
    // signature (the engine groups by the same (color, sorted multiset)
    // key, so the partitions — and min ids — coincide)
    "user_wl_colors" -> {
      val steps = (1 to 2).map { i =>
        s""" n$i AS MATERIALIZED (SELECT e.src AS node, d.color AS nc,
           |     count(*) AS n
           |   FROM sym e JOIN c${i - 1} d ON d.node = e.dst GROUP BY 1, 2),
           | s$i AS MATERIALIZED (SELECT c.node,
           |     c.color::VARCHAR || '|' || string_agg(
           |       x.nc::VARCHAR || ':' || x.n::VARCHAR, ',' ORDER BY x.nc)
           |       AS sig
           |   FROM c${i - 1} c JOIN n$i x ON x.node = c.node
           |   GROUP BY c.node, c.color),
           | c$i AS MATERIALIZED (SELECT node,
           |     min(node) OVER (PARTITION BY sig) AS color FROM s$i)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $userSymSql,
         | c0 AS MATERIALIZED (SELECT DISTINCT src AS node,
         |     CAST(0 AS BIGINT) AS color FROM sym),
         |$steps
         |SELECT node AS user_id, color FROM c2""".stripMargin
    },
    // Newman modularity of the 3-round label-prop partition: the same
    // argmax unroll as kg_communities over the user graph, then exact
    // integer contributions (4·m·m_c − d_c²)·10⁶ floor-div 4·m²
    "user_modularity" -> {
      val steps = (1 to 3).map { i =>
        s""" t$i AS (SELECT s.dst AS node, l.label, count(*) AS c
           |   FROM l${i - 1} l JOIN sym s ON s.src = l.node GROUP BY 1, 2),
           | l$i AS MATERIALIZED (SELECT node, label FROM t$i
           |   QUALIFY row_number() OVER (
           |     PARTITION BY node ORDER BY c DESC, label) = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $userSymSql,
         | l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label
         |   FROM sym),
         |$steps,
         | deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY src),
         | m AS (SELECT count(*) AS m FROM e0),
         | dc AS (SELECT l.label AS community, count(*) AS n_members,
         |     CAST(sum(d.deg) AS BIGINT) AS deg_sum
         |   FROM l3 l JOIN deg d ON d.node = l.node GROUP BY 1),
         | mc AS (SELECT la.label AS community, count(*) AS m_in
         |   FROM e0 JOIN l3 la ON la.node = e0.src
         |     JOIN l3 lb ON lb.node = e0.dst
         |   WHERE la.label = lb.label GROUP BY 1)
         |SELECT dc.community, dc.n_members, coalesce(mc.m_in, 0) AS m_in,
         |  dc.deg_sum,
         |  ((4 * m.m * coalesce(mc.m_in, 0) - dc.deg_sum * dc.deg_sum)
         |    * 1000000) // (4 * m.m * m.m) AS contrib_ppm
         |FROM dc LEFT JOIN mc ON mc.community = dc.community
         |CROSS JOIN m""".stripMargin
    },
    // sampled-source harmonic centrality: per-seed BFS unrolled 3 hops
    // (min-dist recurrence keyed by seed), then the 1000 // dist sum
    "user_harmonic" -> {
      val steps = (1 to 3).map { i =>
        s""" d$i AS MATERIALIZED (SELECT seed, node, min(dist) AS dist FROM (
           |   SELECT seed, node, dist FROM d${i - 1}
           |   UNION ALL
           |   SELECT p.seed, s.dst AS node, p.dist + 1 AS dist
           |   FROM d${i - 1} p JOIN sym s ON s.src = p.node) GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $userSymSql,
         | seeds AS (SELECT DISTINCT src AS seed FROM sym WHERE src % 7 = 0),
         | d0 AS (SELECT seed, seed AS node, 0 AS dist FROM seeds),
         |$steps
         |SELECT node, CAST(sum(1000 // dist) AS BIGINT) AS h_permille,
         |  count(*) AS n_seeds_reached
         |FROM d3 WHERE dist > 0 GROUP BY node""".stripMargin
    },
    // resource-allocation link prediction: non-adjacent pairs sharing >= 2
    // neighbors, ra = sum(1e9 // deg(z)) — integer per-term division
    "user_linkpred" ->
      s"""WITH $userSymSql,
         | deg AS MATERIALIZED (SELECT src AS n, count(*) AS d FROM sym GROUP BY src),
         | w AS MATERIALIZED (SELECT x.src AS node_a, y.src AS node_b, x.dst AS z
         |     FROM sym x JOIN sym y ON x.dst = y.dst AND x.src < y.src),
         | agg AS MATERIALIZED (SELECT node_a, node_b, count(*) AS cn,
         |     CAST(sum(1000000000 // deg.d) AS BIGINT) AS ra
         |   FROM w JOIN deg ON w.z = deg.n GROUP BY node_a, node_b)
         |SELECT node_a, node_b, cn, ra FROM agg
         |WHERE cn >= 2 AND NOT EXISTS (SELECT 1 FROM e0
         |  WHERE e0.src = agg.node_a AND e0.dst = agg.node_b)""".stripMargin,
    // personalized PageRank, single seed = min user: r0 = 1e12, seed base
    // = 1e12·150000 // 1e6 = 1.5e11; per-round full outer join against the
    // seed row mirrors the engine's coalesce-sum exactly
    "user_ppr" -> {
      val steps = (1 to 5).map { i =>
        s""" c$i AS MATERIALIZED (SELECT sym.dst AS node,
           |     (850000 * CAST(sum(p.r // deg.od) AS BIGINT)) // 1000000 AS c
           |   FROM sym JOIN r${i - 1} p ON sym.src = p.node
           |   JOIN deg ON sym.src = deg.src GROUP BY sym.dst),
           | r$i AS MATERIALIZED (SELECT coalesce(c.node, s.node) AS node,
           |     coalesce(c.c, 0) + (CASE WHEN s.node IS NULL THEN 0
           |       ELSE 150000000000 END) AS r
           |   FROM c$i c FULL JOIN sb s ON c.node = s.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $userSymSql,
         | deg AS MATERIALIZED (SELECT src, count(*) AS od FROM sym GROUP BY src),
         | sb AS MATERIALIZED (SELECT min(src) AS node FROM sym),
         | r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM sb),
         |$steps
         |SELECT node, r AS rank_ppt FROM r5""".stripMargin
    },
    // 4 Bellman-Ford rounds from the min user over inverse-co-occurrence
    // weights — the oracle is the NAIVE whole-set recurrence
    // d_i(v) = min(d_{i-1}(v), min_u d_{i-1}(u) + w); the engine's
    // changed-frontier pruning must agree exactly
    "user_sssp" -> {
      val steps = (1 to 4).map { i =>
        s""" d$i AS MATERIALIZED (SELECT node, min(d) AS d FROM (
           |   SELECT node, d FROM d${i - 1}
           |   UNION ALL
           |   SELECT e.dst AS node, p.d + e.w AS d
           |   FROM d${i - 1} p JOIN syme e ON e.src = p.node) GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH b AS MATERIALIZED (SELECT DISTINCT user_id,
         |   epoch_us(ts) // 60000000 AS bkt FROM events),
         | wp AS MATERIALIZED (SELECT x.user_id AS src, y.user_id AS dst,
         |     1000000 // count(*) AS w
         |   FROM b x JOIN b y ON x.bkt = y.bkt AND x.user_id < y.user_id
         |   GROUP BY x.user_id, y.user_id),
         | syme AS MATERIALIZED (SELECT src, dst, w FROM wp
         |   UNION ALL SELECT dst, src, w FROM wp),
         | d0 AS (SELECT min(src) AS node, CAST(0 AS BIGINT) AS d FROM syme),
         |$steps
         |SELECT node, d AS dist FROM d4""".stripMargin
    },
    // earliest-arrival temporal reachability: the oracle unrolls the
    // NAIVE whole-set time-respecting recurrence (arrival_i(v) =
    // min(arrival_{i-1}(v), min t of in-edges with t >= arrival_{i-1}(u)))
    // — the hash match proves the changed-frontier pruning exact
    "user_temporal_reach" -> {
      val steps = (1 to 4).map { i =>
        s""" d$i AS MATERIALIZED (SELECT node, min(a) AS arrival FROM (
           |   SELECT node, arrival AS a FROM d${i - 1}
           |   UNION ALL
           |   SELECT e.dst AS node, e.t AS a
           |   FROM d${i - 1} p JOIN te e
           |     ON e.src = p.node AND e.t >= p.arrival) GROUP BY node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH b AS MATERIALIZED (SELECT DISTINCT user_id,
         |   epoch_us(ts) // 60000000 AS bkt FROM events),
         | tp AS MATERIALIZED (SELECT x.user_id AS src, y.user_id AS dst,
         |     x.bkt AS t
         |   FROM b x JOIN b y ON x.bkt = y.bkt AND x.user_id < y.user_id),
         | te AS MATERIALIZED (SELECT src, dst, t FROM tp
         |   UNION ALL SELECT dst, src, t FROM tp),
         | d0 AS (SELECT min(src) AS node, CAST(0 AS BIGINT) AS arrival
         |   FROM te),
         |$steps
         |SELECT node, arrival FROM d4""".stripMargin
    },
    // deterministic DeepWalk corpus: the oracle re-derives every step of
    // every walk with the same LCG argmin (row_number twin of the
    // engine's min(struct))
    "user_walks" ->
      s"""WITH $userWalksSql
         |SELECT start, walk, step, node FROM walks""".stripMargin,
    // node2vec-biased walk corpus: hash-div-weight argmin per step, with
    // the previous-node adjacency probe as a LEFT JOIN
    "user_walks_biased" ->
      s"""WITH $userWalksBiasedSql
         |SELECT start, walk, step, node FROM bwalks""".stripMargin,
    // skip-gram co-occurrence counts off the walk corpus, symmetric
    // window
    "user_walk_pairs" ->
      s"""WITH $userWalksSql
         |SELECT a.node AS center, b.node AS context, count(*) AS n_pairs
         |FROM walks a JOIN walks b
         |  ON a.start = b.start AND a.walk = b.walk
         |  AND a.step <> b.step
         |  AND abs(a.step - b.step) <= ${Queries.WalkWindow}
         |GROUP BY 1, 2""".stripMargin,
    // one-row graph summary; triangles counted the naive a<b<c way (the
    // engine uses the degree-ordered enumeration — same set)
    "user_graph_stats" ->
      s"""WITH $userSymSql,
         | deg AS MATERIALIZED (SELECT src, count(*) AS d FROM sym GROUP BY src),
         | tri AS MATERIALIZED (SELECT count(*) AS t FROM e0 x
         |   JOIN e0 y ON y.src = x.src AND y.dst > x.dst
         |   JOIN e0 z ON z.src = x.dst AND z.dst = y.dst)
         |SELECT (SELECT count(*) FROM deg) AS n_nodes,
         |  (SELECT count(*) FROM e0) AS n_edges,
         |  (SELECT max(d) FROM deg) AS max_degree,
         |  (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
         |  (SELECT t FROM tri) AS n_triangles,
         |  (SELECT t FROM tri) * 3 * 1000000
         |    // (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS gcc_ppm""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_suppliers,
        | CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q3_join_topk" ->
      """SELECT c_custkey, c_name,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spend DESC, c_custkey LIMIT 10""".stripMargin,
    "q4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q6_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice AS top_price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) WHERE rn = 1""".stripMargin,
    "q7_setop" ->
      "SELECT p_partkey FROM part EXCEPT SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity > 45",
    "q8_distinct_agg" ->
      """SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_segments,
        | count(*) AS n_customers
        |FROM customer GROUP BY c_nationkey""".stripMargin,
    "q9_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 5 AND l_discount > 0.05""".stripMargin,
    "q10_events_window" ->
      """SELECT CAST(floor(epoch_ms(ts)/1000.0/300.0) AS BIGINT) * 300 AS bucket_start,
        | event_type, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q11_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch_ms(ts)/1000.0) AS BIGINT) AS sec,
        |    lag(CAST(floor(epoch_ms(ts)/1000.0) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        | CAST(sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM e GROUP BY user_id""".stripMargin,
    "q12_conditional_agg" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id""".stripMargin,
    "q13_streaming" ->
      """SELECT CAST(floor(epoch_ms(ts)/1000.0/300.0) AS BIGINT) * 300 AS bucket_start,
        | event_type, count(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,
    // session_window semantics: events merge while the gap is STRICTLY
    // below 30 min (windows [t, t+gap) overlap-merge); boundaries at ms
    // precision, start = first event, end = last event + gap
    "q14_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        | s AS (SELECT user_id, ms,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ms
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |       FROM e)
        |SELECT user_id,
        |  CAST(floor(min(ms)/1000.0) AS BIGINT) AS session_start,
        |  CAST(floor((max(ms) + 1800000)/1000.0) AS BIGINT) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // backward as-of join: per event, the latest same-user error at or
    // before it. The naive max-then-join-back form IS the semantics the
    // union-window operator must reproduce; epochs ride as BIGINT micros
    "events_asof" ->
      """WITH r AS (SELECT user_id, ts, max(value) AS err_value FROM events
        |           WHERE event_type = 'error' GROUP BY user_id, ts),
        | m AS (SELECT e.event_id, max(r.ts) AS rts FROM events e
        |       JOIN r ON e.user_id = r.user_id AND r.ts <= e.ts
        |       GROUP BY e.event_id)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS t_us,
        |  epoch_us(m.rts) AS err_t_us, r2.err_value
        |FROM events e LEFT JOIN m ON e.event_id = m.event_id
        |LEFT JOIN r r2 ON r2.user_id = e.user_id AND r2.ts = m.rts""".stripMargin,
    // range join: purchases inside any same-user 10-minute post-error
    // window (both boundaries inclusive); the theta-join form is the
    // semantics the bucketed equi-join must reproduce
    "events_range_join" ->
      """WITH iv AS (SELECT event_id AS err_id, user_id, ts AS s,
        |              ts + INTERVAL 10 MINUTE AS e
        |            FROM events WHERE event_type = 'error'),
        | p AS (SELECT event_id, user_id, ts FROM events
        |       WHERE event_type = 'purchase')
        |SELECT p.event_id, count(*) AS n_windows, min(iv.err_id) AS first_err
        |FROM p JOIN iv ON p.user_id = iv.user_id
        |  AND p.ts >= iv.s AND p.ts <= iv.e
        |GROUP BY p.event_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_dups, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH w AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        | s AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
        | c AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |       FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common, sa.n AS n_a, sb.n AS n_b
        |FROM c JOIN s sa ON c.doc_a = sa.doc_id JOIN s sb ON c.doc_b = sb.doc_id
        |WHERE n_common * 180 >= 80 * (sa.n + sb.n)""".stripMargin,
    "dedup_embedding_grid" ->
      ("""SELECT """ + (0 until 8).map(i =>
        s"CAST(floor(embedding[${i + 1}] * 2) AS BIGINT) AS c$i").mkString(", ") +
        """, count(*) AS n_members, min(vec_id) AS keep_id
          |FROM embeddings GROUP BY ALL""".stripMargin),
    "simsearch_qdot" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        | z AS (SELECT e.vec_id, unnest(e.embedding) AS a, unnest(q.qe) AS b
        |       FROM embeddings e, q)
        |SELECT vec_id,
        | CAST(sum(CAST(floor(CAST(a AS DOUBLE) * 1000) AS BIGINT)
        |        * CAST(floor(CAST(b AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS qdot
        |FROM z GROUP BY vec_id ORDER BY qdot DESC, vec_id LIMIT 20""".stripMargin,
    "text_tokencount" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        | CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'),
        |                      x -> len(x) > 0)) AS INTEGER) AS word_tokens,
        | greatest(CAST(len(string_split(text, ' ')) AS INTEGER),
        |          CAST(ceil(length(text)/4.0) AS INTEGER)) AS bpe_est
        |FROM documents""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        | CAST(length(text) AS INTEGER) AS n_chars,
        | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
        | CAST(list_max(list_transform(string_split(text, ' '), x -> length(x)))
        |      AS INTEGER) AS max_token_len,
        | CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
        |      AS INTEGER) AS n_punct,
        | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |   / len(string_split(text, ' ')) AS uniq_ratio
        |FROM documents""".stripMargin,
    "text_langid" ->
      """WITH h AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '),
        |    x -> x IN ('the','a','of','and','in'))) AS INTEGER) AS en_hits,
        |  CAST(len(list_filter(string_split(text,' '),
        |    x -> x IN ('el','la','de','y','en'))) AS INTEGER) AS es_hits,
        |  CAST(len(list_filter(string_split(text,' '),
        |    x -> x IN ('le','la','de','et','en'))) AS INTEGER) AS fr_hits,
        |  CAST(len(list_filter(string_split(text,' '),
        |    x -> x IN ('der','die','das','und','in'))) AS INTEGER) AS de_hits
        | FROM documents)
        |SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
        | CASE WHEN en_hits = greatest(en_hits, es_hits, fr_hits, de_hits)
        |        AND greatest(en_hits, es_hits, fr_hits, de_hits) > 0 THEN 'en'
        |      WHEN es_hits = greatest(en_hits, es_hits, fr_hits, de_hits)
        |        AND greatest(en_hits, es_hits, fr_hits, de_hits) > 0 THEN 'es'
        |      WHEN fr_hits = greatest(en_hits, es_hits, fr_hits, de_hits)
        |        AND greatest(en_hits, es_hits, fr_hits, de_hits) > 0 THEN 'fr'
        |      WHEN de_hits = greatest(en_hits, es_hits, fr_hits, de_hits)
        |        AND greatest(en_hits, es_hits, fr_hits, de_hits) > 0 THEN 'de'
        |      ELSE 'und' END AS pred_lang
        |FROM h""".stripMargin,
    "kg_mentions" ->
      """SELECT doc_id, surface,
        | CAST((length(text) - length(replace(text, surface, ''))) / length(surface)
        |      AS INTEGER) AS n_mentions
        |FROM documents,
        | (VALUES ('customer'),('part'),('vector'),('column'),('stream')) AS d(surface)
        |WHERE (length(text) - length(replace(text, surface, ''))) / length(surface) > 0""".stripMargin,
    "kg_cooccur_pairs" -> {
      val n = Queries.kgDictWords.map(w =>
        s"(length(text) - length(replace(text, '$w', ''))) / ${w.length}").mkString(" + ")
      s"""SELECT doc_id, CAST($n AS INTEGER) AS n_mentions,
         | CAST(($n) * (($n) - 1) / 2 AS BIGINT) AS n_pairs
         |FROM documents WHERE ($n) > 0""".stripMargin
    },
    "kg_triples" -> kgTriplesSql,
    // node table (S7): one row per canonical entity, mention count over
    // the corpus; same word-position grounds as kg_pipeline_triples
    "kg_nodes" -> {
      val dict = Queries.kgDictWords.map(w => s"'$w'").mkString(", ")
      s"""SELECT 'ent:' || w AS node_id, 'Protein' AS tag,
         |  count(*) AS n_mentions, CAST(1 AS BIGINT) AS n_surfaces,
         |  min(w) AS first_surface
         |FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
         |WHERE w IN ($dict) GROUP BY w""".stripMargin
    },
    // doc_id % 10 ∈ {3, 7, 1, 9} rows carry REAL planted PNG/JPEG/GIF/
    // WebP headers (33/21/10/25-byte payloads) that HeaderDecoder parses;
    // their dims derive from doc_id, n_frames from FakeDecoder over the
    // fixed-size header (1 + n_bytes mod 30 → 4/22/11/26). All other rows
    // are the UTF-8 text payload with the deterministic fake features.
    "multimodal_features" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 10 = 3 THEN 33
        |      WHEN doc_id % 10 = 7 THEN 21
        |      WHEN doc_id % 10 = 1 THEN 10
        |      WHEN doc_id % 10 = 9 THEN 25
        |      ELSE CAST(strlen(text) AS INTEGER) END AS n_bytes,
        | CASE WHEN doc_id % 10 = 3 THEN CAST(1 + doc_id % 1024 AS INTEGER)
        |      WHEN doc_id % 10 = 7 THEN CAST(1 + doc_id % 500 AS INTEGER)
        |      WHEN doc_id % 10 = 1 THEN CAST(1 + doc_id % 1000 AS INTEGER)
        |      WHEN doc_id % 10 = 9 THEN CAST(1 + doc_id % 800 AS INTEGER)
        |      ELSE CAST(64 + strlen(text) % 640 AS INTEGER) END AS width,
        | CASE WHEN doc_id % 10 = 3 THEN CAST(1 + (doc_id * 7) % 1024 AS INTEGER)
        |      WHEN doc_id % 10 = 7 THEN CAST(1 + (doc_id * 3) % 500 AS INTEGER)
        |      WHEN doc_id % 10 = 1 THEN CAST(1 + (doc_id * 9) % 1000 AS INTEGER)
        |      WHEN doc_id % 10 = 9 THEN CAST(1 + (doc_id * 5) % 800 AS INTEGER)
        |      ELSE CAST(64 + (strlen(text) * 31) % 480 AS INTEGER) END AS height,
        | CASE WHEN doc_id % 10 = 3 THEN 4
        |      WHEN doc_id % 10 = 7 THEN 22
        |      WHEN doc_id % 10 = 1 THEN 11
        |      WHEN doc_id % 10 = 9 THEN 26
        |      ELSE CAST(1 + strlen(text) % 30 AS INTEGER) END AS n_frames
        |FROM documents""".stripMargin,
    // audio plumbing: planted WAV rows decode for real, the rest take the
    // deterministic byte-length fakes — both recomputable from doc_id/text
    "multimodal_audio" ->
      """WITH a AS (SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 5 THEN 44
        |       ELSE CAST(strlen(text) AS INTEGER) END AS n_bytes,
        |  CASE WHEN doc_id % 10 = 5
        |       THEN CAST(8000 + (doc_id % 8) * 4000 AS INTEGER)
        |       ELSE CAST(8000 + (strlen(text) * 7) % 40000 AS INTEGER)
        |       END AS sample_rate,
        |  CASE WHEN doc_id % 10 = 5 THEN CAST(1 + doc_id % 2 AS INTEGER)
        |       ELSE CAST(1 + strlen(text) % 2 AS INTEGER) END AS channels,
        |  CASE WHEN doc_id % 10 = 5 THEN 1000 + doc_id % 9000
        |       ELSE 256 + (strlen(text) * 13) % 65536 END AS n_samples
        | FROM documents)
        |SELECT doc_id, n_bytes, sample_rate, channels, n_samples,
        |  (n_samples * 1000) // sample_rate AS dur_ms
        |FROM a""".stripMargin,
  )
}
