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

  /** Per-node triangle counts via degree-ordered edge orientation (the
    * Schank & Wagner 2005 / Suri & Vassilvitskii 2011 "MapReduce
    * triangles" scheme): orient every undirected edge from its
    * lower-(degree, id) endpoint to the higher, enumerate wedges at the
    * LOW-degree apex, and close each wedge with one join back to the
    * oriented edge list.
    *
    * Why orientation matters at scale: wedge count at a node is
    * C(out-degree, 2), and degree-ordering caps every out-degree at
    * O(√E) — a hub of degree 10⁶ contributes C(10⁶,2) wedges unoriented
    * but only wedges among its HIGHER-degree neighbors oriented. The
    * wedge endpoints are ordered by the same (deg, id) key as the
    * orientation, so a wedge's closing edge — if it exists — is oriented
    * exactly wedge-low → wedge-high: one equi-join, no union of probes.
    *
    * Each triangle is found exactly once (at its minimum-(deg, id)
    * vertex) and credits all three corners via a 3-way explode.
    *
    * @param pairs distinct undirected edges as (a, b) — any per-edge
    *              canonicalization accepted, duplicates must be removed
    * @return (node, n_triangles: long) for nodes in ≥ 1 triangle */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    import graft.CacheLifecycle.TrackedPersistOps
    val deg = pairs.select(col("a").as("n"))
      .unionByName(pairs.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    // oriented edge list with the dst's ordering key carried for the
    // wedge comparison; persisted — read by the wedge self-join (twice)
    // and the closing-edge probe
    val e = pairs
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
            struct(col("a").as("src"), col("b").as("dst"),
              struct(col("db").as("kdeg"), col("b").as("kid")).as("kd")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"),
            struct(col("da").as("kdeg"), col("a").as("kid")).as("kd"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.kd").as("kd"))
      .persistTracked()
    val tri = e.as("x").join(e.as("y"),
        col("x.src") === col("y.src") && col("x.kd") < col("y.kd"))
      .select(col("x.src").as("ta"), col("x.dst").as("tb"), col("y.dst").as("tc"))
      .join(e.select(col("src").as("tb"), col("dst").as("tc")), Seq("tb", "tc"))
    tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Bounded-round single-source shortest paths — Bellman-Ford relaxation
    * as iterated min-plus: round i's distance table is the min of the
    * previous table and every edge-relaxed candidate. With INTEGER weights
    * the whole fixpoint is exact arithmetic — engine-portable at any
    * round count, the reason SSSP can be oracle-checked while
    * floating-point shortest paths could not.
    *
    * Per round: one src-keyed join (candidates fan out along edges) + one
    * node-keyed min aggregation with map-side combine — two shuffles,
    * both node/edge-bounded; the distance table is node-sized and eagerly
    * localCheckpointed (the frontier-algorithm lineage rule). `rounds`
    * bounds path length: round r holds exact distances over paths of
    * ≤ r edges (full convergence needs |V|−1 rounds; scoring passes use
    * small bounds).
    *
    * @param edges (src, dst, w) directed, integer weights ≥ 0
    * @param seeds (node) — distance-0 sources
    * @return (node, dist) minimal ≤rounds-edge path weight per reached node */
  def sssp(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    import graft.CacheLifecycle.TrackedPersistOps
    require(rounds >= 0, s"rounds must be >= 0; got $rounds")
    val e = edges.persistTracked()
    val init = seeds.select(col("node"), lit(0L).as("dist")).localCheckpoint(true)
    (1 to rounds).foldLeft(init) { (dist, _) =>
      val relax = e.join(dist, e("src") === dist("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist.unionByName(relax)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
  }

  /** Breadth-first hop distances from a seed set — the frontier-expansion
    * re-expression of the recursive CTE Spark SQL lacks (the DuckDB oracle
    * states the WITH RECURSIVE form; this computes the identical min-hop
    * table iteratively, the standard Pregel/GraphFrames BFS shape).
    *
    * Round h: join the (h−1)-frontier against edges (src-keyed shuffle),
    * distinct the neighbor set, anti-join out already-reached nodes, tag
    * survivors hop h. The reached table is node-bounded and eagerly
    * localCheckpointed every round — frontier algorithms are the textbook
    * lineage-explosion case (round h's plan would otherwise nest all
    * previous rounds). Rounds that find nothing new still union an empty
    * frame — harmless, and `maxHops` bounds the loop; callers wanting
    * convergence detection can count the last frontier.
    *
    * @param seeds (node) — hop-0 nodes
    * @return (node, hop) — minimal hop count ≤ maxHops per reached node */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    import graft.CacheLifecycle.TrackedPersistOps
    require(maxHops >= 0, s"maxHops must be >= 0; got $maxHops")
    // every round joins the frontier against the FULL edge table — persist
    // it once or each round re-runs the caller's whole edge-building plan
    // (measured: the un-persisted form re-ran a 1.2M-row pair self-join
    // per hop, 4x the query cost)
    val e = edges.persistTracked()
    val init = seeds.select(col("node"), lit(0).as("hop")).localCheckpoint(true)
    (1 to maxHops).foldLeft(init) { (reached, h) =>
      val frontier = reached.filter(col("hop") === h - 1)
      val nbrs = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
      val fresh = nbrs.join(reached, Seq("node"), "left_anti")
        .withColumn("hop", lit(h))
      reached.unionByName(fresh).localCheckpoint(true)
    }
  }
}
