package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the sparse-matrix
  * power-iteration family (PageRank here; the same execution shape serves
  * personalized PR, label propagation, HITS).
  *
  * Scale design: one iteration = one src-keyed join (contributions fan out
  * along edges) + one dst-keyed hash aggregation with map-side combine —
  * exactly two shuffles per round, both keyed on node ids, never wider
  * than the edge/node tables. Degrees and the node count are computed once
  * (degree table persisted — released via [[graft.CacheLifecycle]]); the
  * per-round rank table is node-sized. This is the standard Pregel/GraphX
  * message-passing shape restated declaratively so Catalyst plans the
  * joins (broadcast when ranks fit, sort-merge when they don't) and AQE
  * handles hub-node skew.
  */
object Graph {

  /** Deterministic integer-grid PageRank (Page et al. 1999; damping 0.85).
    *
    * Ranks live on the 1e-9 integer grid: each round's contribution
    * `round(0.85 · pr9(u) / deg(u))` is a double op on engine-identical
    * integer inputs snapped straight back to the grid, and the per-node
    * sum is EXACT integer arithmetic — order-independent across engines
    * and partitionings (a plain double PR sum's merge order would differ
    * run to run; the q120/q106 snapping convention applied to an
    * iterative fixpoint). Teleport mass `round(0.15 · 1e9 / |V|)` is the
    * same snap. The grid loses < 1e-9 of mass per hop — scoring noise
    * ~1e-7 after typical iteration counts, far below any ranking use —
    * in exchange for bit-reproducible ranks.
    *
    * PRECONDITION: every node must have at least one out-edge AND one
    * in-edge (no dangling mass handling) — satisfied by construction when
    * callers expand an undirected pair list into both directions, which
    * is the co-occurrence-graph use this serves. Lineage grows linearly
    * in `iters` (two joins per round); callers running many rounds should
    * localCheckpoint every few iterations — at the 2-4 rounds a scoring
    * pass uses, lazy composition executes in one job and is cheaper.
    *
    * @param edges directed (src, dst) pairs, pre-deduplicated
    * @return (node, deg: long, pr9: long) — rank on the 1e-9 grid */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    import graft.CacheLifecycle.TrackedPersistOps
    require(iters >= 0, s"iters must be >= 0; got $iters")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persistTracked()
    val nV = deg.agg(count(lit(1)).as("v"))
    val init = deg.crossJoin(broadcast(nV))
      .select(col("src").as("node"), col("deg"),
        round(lit(1e9) / col("v")).cast("long").as("pr9"))
    (0 until iters).foldLeft(init) { (pr, _) =>
      val contrib = edges.join(pr, edges("src") === pr("node"))
        .select(col("dst"),
          round(lit(0.85) * col("pr9") / col("deg")).cast("long").as("c9"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c9")).as("s9"))
      deg.join(sums, deg("src") === sums("dst"))
        .crossJoin(broadcast(nV))
        .select(deg("src").as("node"), col("deg"),
          (round(lit(0.15) * lit(1e9) / col("v")).cast("long") + col("s9"))
            .as("pr9"))
    }
  }
}
