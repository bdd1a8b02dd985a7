package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** Graph-structured ANN: a staged k-NN neighbor graph (the NSW/HNSW
  * family's base layer) + deterministic greedy beam search over it — the
  * index structure production vector stores serve from, built and probed
  * with Spark primitives.
  *
  * BUILD is corpus-scale but LSH-bounded: candidate pairs come from
  * [[Similarity.lshSimilarPairs]] (multi-table hyperplane banding with the
  * skew-routed bucket self-join — vectors only pairwise-compare on a
  * bucket collision, never all-pairs), reranked exactly, symmetrized, and
  * cut to each node's top-`m` neighbors by (sim DESC, dst ASC) — a fully
  * deterministic graph the DuckDB oracle restates verbatim from the same
  * integer-mixer plane arithmetic. Edges land `partitionBy(src_bucket)`
  * (src mod nBuckets), the [[VectorIndex]] layout discipline: a search
  * round's edge lookup is a planning-time partition-pruned read of the
  * frontier's buckets, not a graph scan.
  *
  * SEARCH is the standard navigable-graph loop made deterministic: start
  * at a fixed entry point (MIN node id — no randomness), expand the
  * current beam's out-edges, score ONLY the newly-reached nodes against
  * the query (exact cosine, rounded on the shared 1e-6 grid), keep the
  * best `beamWidth` of everything visited, repeat `rounds` times, answer
  * with the top-k of the visited set. All ties break on node id, so the
  * whole trajectory — and therefore the result — is reproducible by an
  * unrolled SQL restatement.
  *
  * Scale shape (the point of the structure): per round the work is (a)
  * one partition-pruned edges read filtered to ≤ |beam| literal src ids,
  * (b) one predicate-pushdown corpus read filtered to the ≤ |beam|·m
  * newly-reached ids. The driver holds only (query, node, sim) triples —
  * bounded by queries·(beamWidth + rounds·beamWidth·m), never
  * corpus-sized (the probeTopK bounded-collect convention). Nothing in
  * the search touches more of the corpus than the visited neighborhood.
  */
object NeighborGraph {

  /** Build the k-NN graph and stage it partitioned by src bucket.
    * Edges carry (src, dst, sim, rank) with rank 1..m per src. */
  def build(emb: DataFrame, path: String, m: Int, numTables: Int,
      planesPerTable: Int, nBuckets: Int): Unit = {
    // threshold -1.0 keeps every bucket-collision pair: a navigable graph
    // wants its long-range links, and the top-m cut below bounds degree.
    val pairs = Similarity.lshSimilarPairs(emb, threshold = -1.0,
      numTables = numTables, planesPerTable = planesPerTable,
      eagerSkewProbe = true)
    val both = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"),
        col("sim"))
      .unionByName(pairs.select(col("vec_b").as("src"),
        col("vec_a").as("dst"), col("sim")))
    both
      .withColumn("rank", row_number().over(
        Window.partitionBy("src").orderBy(col("sim").desc, col("dst").asc)))
      .filter(col("rank") <= m)
      .withColumn("src_bucket", col("src") % nBuckets)
      .write.mode("overwrite").partitionBy("src_bucket")
      .parquet(s"$path/edges")
  }

  /** Incremental ANN maintenance — the [[VectorIndex.append]] contract
    * for the graph layout: absorb a batch of NEW vectors into a built
    * graph by finding each one's neighbors WITH THE GRAPH'S OWN SEARCH
    * (the HNSW insertion algorithm: insert = search + link), then
    * appending forward edges (new → found, ranked 1..m) and back-links
    * (found → new, rank 0 — the "appended, pending compaction re-rank"
    * sentinel: existing nodes' files are never rewritten, so their
    * degree may transiently exceed m; search reads edges regardless of
    * rank, and a rebuild re-prunes). Only the touched src_bucket
    * partitions receive files; probes see old and new nodes identically.
    * At 100 TB this is what makes the graph a refreshable serving
    * artifact: an ingest batch costs |batch| bounded beam searches, not
    * a corpus rebuild.
    *
    * @return the forward edges (query_id=new node, neighbor_id, rank,
    *         sim) the append linked, for observability/gating */
  def append(spark: SparkSession, path: String, newEmb: DataFrame,
      corpus: DataFrame, m: Int, beamWidth: Int, rounds: Int,
      nBuckets: Int, nEntries: Int): DataFrame = {
    val found = beamSearch(spark, path, newEmb, corpus, k = m,
      beamWidth = beamWidth, rounds = rounds, nBuckets = nBuckets,
      nEntries = nEntries)
    val fwd = found.select(col("query_id").as("src"),
      col("neighbor_id").as("dst"), col("sim"), col("rank"))
    val back = found.select(col("neighbor_id").as("src"),
      col("query_id").as("dst"), col("sim"), lit(0).as("rank"))
    fwd.unionByName(back)
      .withColumn("src_bucket", col("src") % nBuckets)
      .write.mode("append").partitionBy("src_bucket")
      .parquet(s"$path/edges")
    found
  }

  /** Node deletion — the RTBF/forget contract for the graph layout,
    * partition-scoped (the lakehouse DELETE-WHERE shape): remove every
    * edge that touches a deleted node by rewriting ONLY the buckets that
    * hold one. Out-edge buckets are known arithmetically (id % nBuckets);
    * back-link buckets come from one dst-pushdown scan. Each touched
    * bucket is read, filtered, written to a private sibling, and swapped
    * in — untouched buckets' files are never opened, so a bounded delete
    * batch (RTBF requests, not corpus-scale churn — the literal-IN
    * convention) costs touched-fraction I/O however large the graph.
    * After deletion the graph serves exactly as if the nodes had never
    * been inserted: append(batch) followed by delete(batch) restores the
    * base edge relation verbatim (appended edges all touch the batch),
    * which is what q347/q348 hash-gate. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long],
      nBuckets: Int): Unit = {
    if (ids.isEmpty) return
    recoverSwaps(path) // heal any interrupted prior rewrite before reading
    val edges = spark.read.parquet(s"$path/edges")
    val backBuckets = edges.filter(col("dst").isin(ids: _*))
      .select(col("src_bucket")).distinct()
      .collect().map(_.getAs[Number](0).longValue)
    val touched = (ids.map(_ % nBuckets) ++ backBuckets).distinct.sorted
    touched.foreach { b =>
      val dir = java.nio.file.Paths.get(s"$path/edges/src_bucket=$b")
      if (java.nio.file.Files.isDirectory(dir)) {
        // Bind the scan to the CURRENT files: the swap replaces the dir
        // out from under a path-based lazy plan.
        val kept = spark.read.parquet(dir.toString)
          .filter(!col("src").isin(ids: _*) && !col("dst").isin(ids: _*))
        AtomicSwap.swap(java.nio.file.Paths.get(path), b.toString, dir) { tmp =>
          kept.write.mode("overwrite").parquet(tmp.toString)
        }
      }
    }
  }

  /** Heal interrupted bucket rewrites (delete/compact) — invoked at the
    * entry of every maintenance verb; see [[AtomicSwap]]. */
  def recoverSwaps(path: String): Unit =
    AtomicSwap.recover(java.nio.file.Paths.get(path),
      tag => java.nio.file.Paths.get(s"$path/edges/src_bucket=$tag"))

  /** Deterministic entry points: the `n` smallest node ids in the graph.
    * Multiple entries are the standard navigability fix for a flat k-NN
    * graph (no hierarchy, no long-range links): ids are uncorrelated
    * with embedding position, so the smallest n ids are n independent
    * starts — still fully deterministic. */
  def entryNodes(spark: SparkSession, path: String, n: Int): Seq[Long] =
    spark.read.parquet(s"$path/edges").select(col("src")).distinct()
      .orderBy(col("src")).limit(n).collect().map(_.getLong(0)).toSeq

  /** The per-round frontier read: edges of the given src ids, as a
    * partition-pruned (src_bucket IN buckets-of-frontier) +
    * predicate-pushdown (src IN frontier) scan of the staged layout.
    * Exposed so the pruning contract is plan-assertable in tests —
    * a search round reads only the frontier's partitions, never the
    * whole graph. */
  def frontierEdges(spark: SparkSession, path: String, srcIds: Seq[Long],
      nBuckets: Int): DataFrame =
    spark.read.parquet(s"$path/edges")
      .filter(col("src_bucket").isin(srcIds.map(_ % nBuckets).distinct: _*)
        && col("src").isin(srcIds: _*))

  /** Greedy beam search: top-k exact-cosine neighbors of each query among
    * the nodes the beam visits. Returns (query_id, neighbor_id, rank,
    * sim); rank 1..k by (sim DESC, neighbor ASC), the query's own node
    * excluded from the answer (it still navigates — its out-edges are the
    * best possible frontier when the walk reaches it). */
  def beamSearch(spark: SparkSession, path: String, queries: DataFrame,
      corpus: DataFrame, k: Int, beamWidth: Int, rounds: Int,
      nBuckets: Int, nEntries: Int = 1): DataFrame = {
    import spark.implicits._
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("q_emb"),
      l2Norm(col("embedding")).as("q_nrm"))
    val embN = corpus.select(col("vec_id"),
      asDouble(col("embedding")).as("n_emb"),
      l2Norm(col("embedding")).as("n_nrm"))
    // Score (query, node) pairs: predicate-pushdown corpus read of just
    // the candidate ids, broadcast pair list + broadcast queries.
    def score(pairs: Seq[(Long, Long)]): Array[(Long, Long, Double)] = {
      if (pairs.isEmpty) return Array.empty
      val ids = pairs.map(_._2).distinct.sorted
      val pdf = pairs.toDF("query_id", "node")
      embN.filter(col("vec_id").isin(ids: _*))
        .join(broadcast(pdf), col("vec_id") === col("node"))
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("node"),
          round(dotProduct(col("q_emb"), col("n_emb"))
            / (col("q_nrm") * col("n_nrm")), 6).as("sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    val entries = entryNodes(spark, path, nEntries)
    val queryIds = q.select(col("query_id")).collect().map(_.getLong(0))
    // visited: (query, node) -> sim. Bounded by queries·rounds·beam·m.
    var visited: Map[(Long, Long), Double] =
      score(for (qi <- queryIds.toSeq; e <- entries) yield qi -> e)
        .map { case (qi, n, s) => (qi, n) -> s }.toMap
    def beamOf(v: Map[(Long, Long), Double]): Seq[(Long, Long)] =
      v.toSeq.groupBy(_._1._1).toSeq.flatMap { case (_, entries) =>
        entries.sortBy { case ((_, node), sim) => (-sim, node) }
          .take(beamWidth).map(_._1)
      }
    var r = 0
    var frontier = beamOf(visited)
    while (r < rounds && frontier.nonEmpty) {
      val srcIds = frontier.map(_._2).distinct.sorted
      val beamDf = frontier.toDF("query_id", "src")
      // partition-pruned + literal-IN edge expansion of the frontier
      val expanded = frontierEdges(spark, path, srcIds, nBuckets)
        .join(broadcast(beamDf), "src")
        .select(col("query_id"), col("dst"))
        .distinct()
        .collect().map(x => (x.getLong(0), x.getLong(1)))
      val fresh = expanded.filter(p => !visited.contains(p)).toSeq
      visited ++= score(fresh).map { case (qi, n, s) => (qi, n) -> s }
      frontier = beamOf(visited)
      r += 1
    }
    val answer = visited.toSeq
      .filter { case ((qi, node), _) => qi != node }
      .groupBy(_._1._1).toSeq.flatMap { case (qi, entries) =>
        entries.sortBy { case ((_, node), sim) => (-sim, node) }
          .take(k).zipWithIndex
          .map { case (((_, node), sim), i) => (qi, node, i + 1, sim) }
      }
    answer.toDF("query_id", "neighbor_id", "rank", "sim")
  }
}
