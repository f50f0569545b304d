package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over the materialized knowledge-graph edge table —
  * the rollup stage downstream of extraction (`Queries.kgEdgeRollup`):
  * once per-document triples are merged into (subj, pred, obj, n_docs)
  * edges, a KG consumer's first questions are structural (how connected
  * is each entity? which entities are central?). Both operators here are
  * pure DataFrame compositions designed for a billion-edge table.
  *
  * PageRank runs in FIXED-POINT integer arithmetic (parts-per-`scale`
  * ranks, damping in ppm) so the result is bit-exact across engines —
  * the same trick the quantized-embedding operators use: the DuckDB
  * oracle unrolls the identical integer recurrence and a hash match
  * proves every division and sum, not "close enough floats". Integer
  * division truncates a little rank mass per step; that loss is
  * deterministic and identical on both sides, and ranking ORDER matches
  * the float algorithm for any non-degenerate graph. (PageRank: Page,
  * Brin, Motwani, Winograd 1999; damping 0.85 is the published default.)
  */
object GraphOps {

  /** Undirected view of a directed/unordered edge list: both directions,
    * distinct. Input columns (src, dst); self-loops are kept as-is (one
    * row — src = dst collapses under distinct). */
  def symmetrize(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("src"), col("dst")).distinct()
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Per-node structural rollup of an edge-rollup table
    * (subj, obj, n_docs): undirected degree (distinct neighbors — robust
    * to multi-predicate rollups where (subj, obj) repeats per pred) and
    * total supporting-document count over incident edges. One unionByName
    * (no shuffle) + one map-side-combinable aggregation — the same shape
    * at 10⁹ edges. */
  def nodeDegrees(edgeRollup: DataFrame): DataFrame = {
    val sym = edgeRollup
      .select(col("subj").as("node"), col("obj").as("nb"), col("n_docs"))
      .unionByName(edgeRollup
        .select(col("obj").as("node"), col("subj").as("nb"), col("n_docs")))
    sym.groupBy(col("node"))
      .agg(countDistinct(col("nb")).as("degree"),
        sum(col("n_docs")).as("doc_support"))
  }

  /** Fixed-iteration integer PageRank over an undirected edge list.
    *
    * Ranks are longs scaled by `scale` (default parts-per-trillion);
    * init r₀ = scale div N, then `iterations` rounds of
    *   r'(v) = base + (dampingPpm · Σ_{u→v} (r(u) div od(u))) div 10⁶,
    *   base  = (scale div N) · (10⁶ − dampingPpm) div 10⁶.
    * Every node of the symmetrized graph has od ≥ 1 and an in-edge, so
    * the aggregation covers all nodes each round — no dangling-mass or
    * left-join branch needed.
    *
    * Scale shape: the edge table (|E| rows, the big side) is degree-joined
    * and hash-REPARTITIONED ON src ONCE, then persisted — the cached scan
    * reports that partitioning, so each iteration's rank join shuffles
    * only the rank table (|V| rows, orders of magnitude smaller; at local
    * catalog scale Spark broadcasts it and the edge side never moves at
    * all). The per-iteration groupBy(dst) is one map-side-combinable
    * shuffle of (node, contrib) longs. `localCheckpoint` per round cuts
    * the lineage exactly like the connected-components loop
    * ([[graft.canon.ConnectedComponents]]) — k iterations stay k·O(1)
    * plans, not one exponentially-nested one.
    *
    * @return DataFrame(node, rank_ppt) — rank in parts-per-`scale`. */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               dampingPpm: Long = 850000L,
               scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"dampingPpm must be in [0, 1e6], got $dampingPpm")
    val sym = symmetrize(edges)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val e = sym.join(deg, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.count() // one bounded action; also warms the edge cache
    require(n > 0, "pageRank needs a non-empty edge list")
    val r0 = scale / n
    val base = r0 * (1000000L - dampingPpm) / 1000000L
    var ranks = deg.select(col("src").as("node"), lit(r0).as("r"))
    for (_ <- 1 to iterations) {
      ranks = e.join(ranks, e("src") === ranks("node"))
        .select(e("dst").as("node"), expr("r div od").as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("s"))
        .select(col("node"),
          (lit(base) + expr(s"($dampingPpm * s) div 1000000")).as("r"))
        .localCheckpoint(true)
    }
    e.unpersist()
    ranks.select(col("node"), col("r").as("rank_ppt"))
  }
}
