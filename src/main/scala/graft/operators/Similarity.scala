package graft.operators

import graft.CacheLifecycle.TrackedPersistOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate & exact nearest-neighbor search over embedding columns.
  *
  * Scale design:
  *  - Brute force is the baseline: broadcast the (small) query set against
  *    the corpus — an embarrassingly parallel scan, no shuffle until the
  *    final per-query top-k. Ranks are taken over rounded similarity with
  *    an id tiebreak so results are reproducible across engines/runs.
  *  - The IVF variant is the scale path: k-means-style cells (here: the
  *    corpus' own label attribute or LSH buckets as the coarse quantizer),
  *    queries probe only nprobe cells → the scan shrinks by |cells|/nprobe.
  *    At 100 TB the corpus would be written bucketed by cell id, making the
  *    probe a partition-pruned read instead of a full scan.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, rank, sim).
    *
    * The query set is broadcast against a corpus scan. A broadcast has a
    * hard executor-memory ceiling, so query sets beyond
    * `maxBroadcastQueries` are hash-SHARDED and each shard broadcast
    * against its own corpus scan — the operator stays correct at any query
    * count instead of OOMing the executors. Each shard re-scans the corpus:
    * that is the honest cost of exact brute force, and the signal that a
    * large-query caller wants [[ivfTopK]], where the scan shrinks to
    * probed cells.
    *
    * Sizing the shard fan-out needs the query count at plan-construction
    * time. Pass `queryCountHint` (>= 0) when the caller knows it — the
    * operator then stays a pure lazy plan builder like the Skew family.
    * The hint MUST be an UPPER bound on the actual query count: sharding
    * is hash-mod over the full query set, so results are complete for any
    * hint, but an UNDERestimate lowers nShards and lets a shard's
    * broadcast exceed the `maxBroadcastQueries` executor-memory bound —
    * the hint trades the OOM guard, never correctness. Callers that can't
    * bound the count should leave the default and pay the count job.
    * With the default hint of -1 it runs ONE count job up front (the
    * documented price of self-sizing; `.explain()` on the result will
    * execute that count). The sharded branch persists the query
    * projection for reuse across shard branches and relies on Spark's LRU
    * block eviction to reclaim it, the same convention as
    * `Skew.hybridBucketPairs` — an explicit unpersist at construction
    * would evict the cache before the (lazy) result ever ran. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      maxBroadcastQueries: Int = 1 << 16, queryCountHint: Long = -1L): DataFrame = {
    require(queryCountHint >= -1L,
      s"queryCountHint must be -1 (self-size via count) or an upper bound on " +
        s"the query count; got $queryCountHint")
    // norms precomputed per vector (not per pair): sim needs 1 dot product
    // instead of 3, and sqrt(dot(v,v)) is the same double either way.
    // The float→double widening happens HERE, once per vector, not inside
    // the pair loop: dotProduct casts its inputs, and a cast of an
    // array<float> allocates a fresh double[] — two allocations per PAIR
    // in the n×m scoring stage. Pre-cast arrays make the per-pair work a
    // bare codegen dot product (values are bit-identical either way;
    // float→double is exact).
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("q_emb"),
      l2Norm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("c_emb"),
      l2Norm(col("embedding")).as("c_norm"))
    val nQ = if (queryCountHint >= 0L) queryCountHint else q.count()
    val nShards = math.max(1L, (nQ + maxBroadcastQueries - 1) / maxBroadcastQueries).toInt
    val qSrc = if (nShards == 1) q else q.persistTracked()
    val scored = (0 until nShards).map { s =>
      val shard =
        if (nShards == 1) qSrc
        else qSrc.filter(pmod(xxhash64(col("query_id")), lit(nShards.toLong)) === s)
      c.crossJoin(broadcast(shard))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", round(
          dotProduct(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 6))
    }.reduce(_ unionByName _)
    // every query_id's scored rows live entirely inside its shard's branch,
    // so the per-query ranking window is unaffected by the sharding
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** IVF-style ANN: coarse cells from per-cell centroids, queries probe the
    * `nprobe` nearest cells, exact rerank inside probed cells only.
    *
    * @param cellCol an existing coarse-cell assignment on the corpus (for
    *                real IVF: a k-means cell id; any clustering works)
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, cellCol: Column,
      k: Int, nprobe: Int): DataFrame = {
    val cells = corpus.select(cellCol.as("cell"), col("embedding").as("emb"))
    // Centroid per cell: per-dimension mean, decimal-routed and rounded so
    // the probe ranking is deterministic across engines and partitionings
    // (a plain double avg's partial-merge order varies run to run).
    val centroids = cells
      .select(col("cell"), posexplode(asDouble(col("emb"))).as(Seq("pos", "v")))
      .groupBy("cell", "pos")
      .agg(round(sum(col("v").cast("decimal(18,9)")).cast("double") / count(lit(1)), 6)
        .as("cv"))
      .groupBy("cell").agg(array_sort(collect_list(struct(col("pos"), col("cv"))))
        .getField("cv").as("centroid"))

    // pre-cast once per vector, not per scored pair (see bruteForceTopK)
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("q_emb"))
    val probes = q.crossJoin(broadcast(centroids))
      // round(6) + cell tie-break: reproducible probe choice (see q53 oracle)
      .withColumn("csim", round(cosineSimilarity(col("q_emb"), col("centroid")), 6))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cell"))

    val corpusCells = corpus.select(cellCol.as("cell"),
      col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("c_emb"))
    val scored = corpusCells.join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosineSimilarity(col("q_emb"), col("c_emb")), 6))
    scored.withColumn("rank", row_number().over(
      Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Margin-based nearest-neighbor pair mining (Artetxe & Schwenk 2019,
    * arXiv:1811.01136 "Margin-based Parallel Corpus Mining with Multilingual
    * Sentence Embeddings", the LASER/CCMatrix criterion; cf. PAPERS.md):
    * raw cosine over-fires in dense hubs, so each candidate pair (x, y) is
    * scored by its RATIO margin against both sides' neighborhoods,
    *
    *   margin(x, y) = cos(x, y) / ( (avgF(x) + avgB(y)) / 2 )
    *                = 2k · cos(x, y) / ( ΣF(x) + ΣB(y) )
    *
    * where ΣF(x) sums x's k nearest-target cosines and ΣB(y) sums y's k
    * nearest-source cosines. The second form is what's computed: the sums
    * of round(6) similarities stay EXACT in decimal(18,9), so the margin
    * is one double division of two engine-identical operands, snapped once
    * to the 1e-9 integer grid (the q106/q120 convention) for a
    * float-tie-free total order.
    *
    * Candidates are the forward top-k pairs; output is the global top-N by
    * (margin_e9 desc, src_id, tgt_id) — a TakeOrderedAndProject.
    *
    * Scale: two exact [[bruteForceTopK]] passes (the honest small-scale
    * baseline — broadcast-sharded, never all-pairs materialized) plus two
    * key-bounded aggregations and two joins on id keys. At 100 TB swap
    * both passes to [[ivfTopK]] unchanged — the margin algebra only needs
    * the per-side top-k lists, however they were found. */
  def marginMining(src: DataFrame, tgt: DataFrame, k: Int, topN: Int,
      srcCountHint: Long = -1L, tgtCountHint: Long = -1L): DataFrame = {
    import graft.CacheLifecycle.TrackedPersistOps
    require(k >= 1, s"k must be >= 1; got $k")
    // consumed twice: candidate pairs + the forward neighborhood sums
    val fwd = bruteForceTopK(src, tgt, k, queryCountHint = srcCountHint)
      .persistTracked()
    val bwd = bruteForceTopK(tgt, src, k, queryCountHint = tgtCountHint)
    val sumF = fwd.groupBy(col("query_id"))
      .agg(sum(col("sim").cast("decimal(18,9)")).as("sum_f"))
    val sumB = bwd.groupBy(col("query_id"))
      .agg(sum(col("sim").cast("decimal(18,9)")).as("sum_b"))
      .withColumnRenamed("query_id", "neighbor_id")
    fwd.join(sumF, "query_id")
      .join(sumB, "neighbor_id")
      .withColumn("margin_e9", round(
        lit(2.0 * k) * col("sim") / (col("sum_f") + col("sum_b")).cast("double")
          * lit(1e9)).cast("long"))
      .orderBy(col("margin_e9").desc, col("query_id"), col("neighbor_id"))
      .limit(topN)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("sim"),
        (col("margin_e9").cast("double") / lit(1e9)).as("margin"))
  }

  /** Rounded squared L2 distance via three dot products. The expansion
    * |e-c|^2 = e.e - 2 e.c + c.c reuses the codegen'd [[dotProduct]] and —
    * unlike a zip_with fold — evaluates in the exact arithmetic order a SQL
    * engine's `ip(e,e) - 2*ip(e,c) + ip(c,c)` does, so the rounded value is
    * engine-portable (the oracle restates it verbatim). */
  private[graft] def sqDistRounded(e: Column, c: Column): Column =
    round(dotProduct(e, e) - lit(2.0) * dotProduct(e, c) + dotProduct(c, c), 6)

  /** Nearest-centroid assignment: adds `cell` to `corpus` (argmin rounded
    * squared L2, cell-id tie-break).
    *
    * Scale shape: the centroid set (k × dim doubles — a few MB even at
    * k=65536, dim=1024) is packed into ONE broadcast row and the argmin is
    * a per-row array fold — a NARROW transform, no shuffle, no per-vector
    * window. A crossJoin + `row_number` assignment would shuffle n×k rows
    * per iteration; this scans the corpus once per call and nothing else.
    *
    * @param centroids (cell: long, centroid: array<double>) — from
    *                  [[trainKMeansCells]] or any caller-built quantizer
    */
  def assignKMeansCells(corpus: DataFrame, centroids: DataFrame,
      embCol: String = "embedding"): DataFrame = {
    // An empty quantizer would silently assign cell=null to every row
    // (groupBy().agg over zero rows yields one row with an empty list, and
    // array_min of an empty array is null) — fail loudly instead.
    require(!centroids.isEmpty, "assignKMeansCells: centroids is empty")
    val packed = centroids
      .select(struct(col("cell"), col("centroid")).as("c"))
      .groupBy().agg(array_sort(collect_list(col("c"))).as("graft_cents"))
    corpus.crossJoin(broadcast(packed))
      .withColumn("cell",
        array_min(transform(col("graft_cents"), c =>
          struct(sqDistRounded(asDouble(col(embCol)), c.getField("centroid")).as("dist"),
            c.getField("cell").as("cell"))))
          .getField("cell"))
      .drop("graft_cents")
  }

  /** Distributed deterministic k-means (Lloyd's): the coarse-quantizer
    * trainer for [[ivfTopK]] — answers "where do cells come from" without a
    * caller-supplied clustering.
    *
    * Per iteration: one narrow assignment pass ([[assignKMeansCells]] —
    * broadcast centroids, per-row argmin, NO shuffle) plus one centroid
    * update — a (cell, pos)-keyed hash aggregation over n×dim exploded
    * components with map-side partial combine, i.e. exactly ONE shuffle per
    * iteration whose width is k×dim regardless of corpus size. This is the
    * same execution shape MLlib's KMeans uses (per-partition sum/count then
    * merge), restated declaratively so Catalyst handles the combine.
    *
    * Determinism (what makes the trainer oracle-checkable, q122):
    *  - seeding: the k smallest `vec_id` vectors, cell id = seed vec_id.
    *    PRECONDITION: `vec_id` must be unique — duplicate ids make the
    *    ORDER BY + LIMIT seed selection engine/run-dependent and collide
    *    cell ids. Production pipelines wanting k-means++/|| spread can
    *    pass their own seed set via `initCells` (same schema as the
    *    result); the default is the portable choice any engine restates
    *    with ORDER BY + LIMIT.
    *  - assignment: argmin of ROUNDED (6 dp) squared L2 with cell-id
    *    tie-break; the distance expansion matches SQL arithmetic order.
    *  - update: per-dimension mean through the decimal(18,9) route + round
    *    (the repo-wide portable-mean convention, see q52).
    * Empty cells drop out (both engines agree on which).
    *
    * Iteration hygiene (what keeps per-iteration cost FLAT in `iters`):
    *  - the embedding projection is persisted once (tracked — released by
    *    the session owner via [[graft.CacheLifecycle.releaseAll]]), so
    *    iteration i reads the cache instead of rescanning the corpus;
    *  - each iteration's centroid table (k×dim values — tiny) is eagerly
    *    localCheckpointed, truncating the lineage that would otherwise
    *    nest iteration i's whole plan inside iteration i+1's and make both
    *    planning time and any recompute grow linearly with `iters`.
    *    ScaleStress `--kmeans` measures the flatness.
    *
    * @return (cell: long, centroid: array<double>) — feed `corpus` joined
    *         on [[assignKMeansCells]]'s `cell` into [[ivfTopK]]'s `cellCol`
    */
  def trainKMeansCells(corpus: DataFrame, k: Int, iters: Int,
      initCells: Option[DataFrame] = None): DataFrame = {
    import graft.CacheLifecycle.TrackedPersistOps
    require(k >= 1, s"k must be >= 1; got $k")
    require(iters >= 0, s"iters must be >= 0; got $iters")
    val emb = corpus.select(col("vec_id"), asDouble(col("embedding")).as("embedding"))
      .persistTracked()
    val seeds = initCells.getOrElse(
      emb.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id").cast("long").as("cell"), col("embedding").as("centroid")))
    (0 until iters).foldLeft(seeds) { (cent, _) =>
      assignKMeansCells(emb, cent)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        // decimal-routed portable mean + round(6) margin — the q52 convention
        .agg(round(sum(col("v").cast("decimal(18,9)")).cast("double") / count(lit(1)), 6)
          .as("cv"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("cv"))))
          .getField("cv").as("centroid"))
        .localCheckpoint(true)
    }
  }

  /** Subvector `sub` (0-based) of an `array<double>` embedding split into
    * `m` contiguous subspaces: positions [sub·d/m, (sub+1)·d/m) with floor
    * boundaries, so any dimension (not just multiples of m) splits cleanly
    * and the DuckDB restatement (`list_slice(e, (sub*d)//m + 1,
    * ((sub+1)*d)//m)`) selects the identical components. */
  private[graft] def subSlice(emb: Column, sub: Int, m: Int): Column = {
    val d = size(emb)
    val lo = floor(d.cast("double") * sub / m).cast("int")
    val hi = floor(d.cast("double") * (sub + 1) / m).cast("int")
    slice(emb, lo + 1, hi - lo)
  }

  /** The (vec_id, sub, se) exploded subvector view of a corpus: one row
    * per vector per subspace. The narrow generator every PQ stage shares. */
  private def subRows(corpus: DataFrame, m: Int): DataFrame =
    corpus.select(col("vec_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          subSlice(asDouble(col("embedding")), s, m).as("se"))): _*)).as("x"))
      .select(col("vec_id"), col("x.sub").as("sub"), col("x.se").as("se"))

  /** Product-quantization codebook trainer (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1)): the
    * embedding is split into `m` contiguous subspaces and each subspace
    * gets its own deterministic k-means quantizer — smallest-id seeding,
    * rounded-L2 argmin with cell tie-break, decimal-mean update, the exact
    * [[trainKMeansCells]] conventions, so the whole trainer stays
    * oracle-checkable.
    *
    * All m subspaces train TOGETHER in one plan: the corpus explodes once
    * into (vec, sub) subvector rows (persisted — iteration i reads cache),
    * and each Lloyd round is ONE broadcast-argmin pass plus ONE
    * (sub, cell, pos)-keyed update shuffle covering every subspace — not m
    * separate per-subspace pipelines (an earlier draft trained each
    * subspace through its own persist/checkpoint chain: m× the job count
    * and m× the corpus scans for identical output). Per-round results are
    * eagerly localCheckpointed — flat lineage in `iters`, the trainer
    * hygiene rule.
    *
    * Codewords are re-indexed DENSE per subspace (`cw` = rank of the seed
    * cell id, 0-based) because ADC addresses lookup tables positionally;
    * the rank window runs over ≤ m·k rows — driver-sized. The returned
    * codebook is m×k×(d/m) = k×d doubles — broadcast-sized at any corpus
    * size.
    *
    * @return (sub: int, cw: long, cell: long, centroid: array<double>) */
  def trainPqCodebooks(corpus: DataFrame, m: Int, k: Int, iters: Int): DataFrame = {
    import graft.CacheLifecycle.TrackedPersistOps
    require(m >= 1, s"m must be >= 1; got $m")
    require(k >= 1, s"k must be >= 1; got $k")
    require(iters >= 0, s"iters must be >= 0; got $iters")
    val subs = subRows(corpus, m).persistTracked()
    // seeds: the k smallest vec_ids' subvectors, per subspace — the
    // per-sub window form of trainKMeansCells' ORDER BY + LIMIT seeding
    // (same unique-vec_id precondition)
    val seeds = subs.withColumn("rn",
        row_number().over(Window.partitionBy(col("sub")).orderBy(col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("sub"), col("vec_id").cast("long").as("cell"),
        col("se").as("centroid"))
    val trained = (0 until iters).foldLeft(seeds) { (cent, _) =>
      val packed = cent.groupBy(col("sub"))
        .agg(array_sort(collect_list(struct(col("cell"), col("centroid"))))
          .as("cents"))
      subs.join(broadcast(packed), "sub")
        .withColumn("cell", array_min(transform(col("cents"), c =>
          struct(sqDistRounded(col("se"), c.getField("centroid")).as("dist"),
            c.getField("cell").as("cell")))).getField("cell"))
        .select(col("sub"), col("cell"), posexplode(col("se")).as(Seq("pos", "v")))
        .groupBy("sub", "cell", "pos")
        // decimal-routed portable mean + round(6) — the q52 convention
        .agg(round(sum(col("v").cast("decimal(18,9)")).cast("double") / count(lit(1)), 6)
          .as("cv"))
        .groupBy("sub", "cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("cv"))))
          .getField("cv").as("centroid"))
        // the codebook is m×k rows — coalesce before the eager checkpoint
        // so materialization and every downstream read is 1 task, not
        // shuffle-partitions-many near-empty ones (measured: the 32-task
        // fan-out of driver-sized intermediates dominated the toy-scale
        // wall clock; at real scale this table is no bigger)
        .coalesce(1)
        .localCheckpoint(true)
    }
    trained.coalesce(1)
      .withColumn("cw",
        row_number().over(Window.partitionBy(col("sub")).orderBy(col("cell")))
          .cast("long") - 1)
      .select(col("sub"), col("cw"), col("cell"), col("centroid"))
  }

  /** PQ encoding: each vector's `m` subvectors are assigned to their
    * nearest codeword in ONE narrow pass — subvectors explode per row, the
    * full m-subspace codebook broadcasts grouped by sub, the argmin is a
    * per-row fold, and the m codes regroup into an array via one
    * vec_id-keyed aggregation. The result is the storage form a 100 TB
    * vector lake keeps: m small ints (m bytes in a fixed-width layout)
    * instead of d floats — a ~d·4/m× compression — and the ONLY thing
    * [[pqTopK]] scans.
    *
    * @return (vec_id, codes: array<long>) with codes(s) ∈ [0, k) dense */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int): DataFrame = {
    // an empty codebook would make the inner join silently drop the whole
    // corpus — fail loudly instead (one job over the tiny checkpointed
    // codebook, the assignKMeansCells convention)
    require(!codebooks.isEmpty, "pqEncode: codebooks is empty")
    val packed = codebooks.groupBy(col("sub"))
      .agg(array_sort(collect_list(struct(col("cw").as("cell"), col("centroid"))))
        .as("cents"))
    subRows(corpus, m).join(broadcast(packed), "sub")
      .withColumn("code", array_min(transform(col("cents"), c =>
        struct(sqDistRounded(col("se"), c.getField("centroid")).as("dist"),
          c.getField("cell").as("cell")))).getField("cell"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code"))))
        .getField("code").as("codes"))
  }

  /** PQ asymmetric-distance (ADC) top-k: approximate squared-L2 search
    * that never touches the original corpus vectors — only the m-long
    * `codes` from [[pqEncode]] plus a per-query lookup table.
    *
    * Per query, the LUT holds the rounded squared L2 from each of its m
    * subvectors to each of that subspace's k codewords (m×k rounded
    * doubles). The approximate distance of a corpus vector is the sum of
    * its m table entries — summed through decimal(18,6) (each entry is on
    * the 1e-6 grid after round(6), so the sum is EXACT and
    * order-independent; a plain double sum's merge order would differ
    * between engines).
    *
    * Execution shape: codes posexplode to (neighbor, sub, code) — n×m
    * narrow rows reading m longs per vector instead of d floats — joined
    * against the BROADCAST LUT (Q×m×k rows) on (sub, cw), then one
    * (query, neighbor)-keyed hash aggregation with map-side combine. One
    * shuffle, sized n×Q pairs. At 100 TB this is the classic IVF-PQ inner
    * loop; compose with [[ivfTopK]]-style cell probing to bound n per
    * query.
    *
    * @return (query_id, neighbor_id, rank, adist) — rank by (adist asc,
    *         neighbor_id) so ties are engine-portable */
  def pqTopK(queries: DataFrame, codes: DataFrame, codebooks: DataFrame,
      m: Int, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("q_emb"))
    val qSubs = q.select(col("query_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), subSlice(col("q_emb"), s, m).as("se"))): _*)).as("x"))
      .select(col("query_id"), col("x.sub").as("sub"), col("x.se").as("se"))
    val lut = qSubs
      .join(broadcast(codebooks.select(col("sub"), col("cw"), col("centroid"))), "sub")
      .select(col("query_id"), col("sub"), col("cw"),
        sqDistRounded(col("se"), col("centroid")).as("dist"))
    val exploded = codes.select(col("vec_id").as("neighbor_id"),
      posexplode(col("codes")).as(Seq("sub", "cw")))
    val scored = exploded.join(broadcast(lut), Seq("sub", "cw"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dist").cast("decimal(18,6)")).cast("double").as("adist"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist"))
  }

  /** IVF-PQ: the composed 100 TB ANN search shape — coarse k-means cells
    * bound WHICH vectors are scanned (the IVF half: queries probe their
    * `nprobe` nearest cells by the same rounded squared L2 the assignment
    * used), and product-quantization codes bound WHAT is read per vector
    * (the PQ half: m longs instead of d floats, scored via the broadcast
    * ADC lookup table). This is [[pqTopK]] with its corpus scan shrunk to
    * probed cells — the standard Jégou 2011 "IVFADC" system layout. At
    * real scale the codes table is written bucketed by `cell`, turning the
    * probe join into a partition-pruned read.
    *
    * All inputs come from the deterministic trainers
    * ([[trainKMeansCells]]/[[assignKMeansCells]] for cells,
    * [[trainPqCodebooks]]/[[pqEncode]] for codes), so the whole pipeline —
    * coarse training, probe ranking, ADC — is oracle-checkable end to end.
    *
    * @param corpusCells (vec_id, cell) coarse assignment
    * @param centroids   (cell, centroid) the coarse quantizer
    * @return (query_id, neighbor_id, rank, adist) within probed cells */
  def ivfPqTopK(queries: DataFrame, corpusCells: DataFrame, codes: DataFrame,
      centroids: DataFrame, codebooks: DataFrame,
      m: Int, k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("q_emb"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cd", sqDistRounded(col("q_emb"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cd").asc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cell"))
    val qSubs = q.select(col("query_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), subSlice(col("q_emb"), s, m).as("se"))): _*)).as("x"))
      .select(col("query_id"), col("x.sub").as("sub"), col("x.se").as("se"))
    val lut = qSubs
      .join(broadcast(codebooks.select(col("sub"), col("cw"), col("centroid"))), "sub")
      .select(col("query_id"), col("sub"), col("cw"),
        sqDistRounded(col("se"), col("centroid")).as("dist"))
    // candidate codes: only vectors whose cell some query probes — the
    // scan-shrinking join; probes is Q×nprobe rows, broadcast
    val cand = codes.join(corpusCells.select(col("vec_id"), col("cell")), "vec_id")
      .join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        posexplode(col("codes")).as(Seq("sub", "cw")))
    val scored = cand.join(broadcast(lut), Seq("query_id", "sub", "cw"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dist").cast("decimal(18,6)")).cast("double").as("adist"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist"))
  }

  /** Greedy k-center coreset selection (Gonzalez 1985, "Clustering to
    * minimize the maximum intercluster distance", TCS 38 — the classic
    * 2-approximation for k-center, and the farthest-point-sampling shape
    * data-selection pipelines use to pick a geometrically diverse subset):
    * seed with the smallest `vec_id`, then k−1 rounds of "add the point
    * farthest from the current center set".
    *
    * Each round is ONE narrow corpus pass (the center set — ≤ k vectors —
    * is packed into a broadcast row, each point folds an array_min over the
    * rounded squared L2s, the same argmin shape as [[assignKMeansCells]])
    * followed by a TakeOrdered(1) argmax: no shuffle wider than one row per
    * partition, ever. The corpus projection is persisted once (tracked, see
    * [[graft.CacheLifecycle]]) so round i reads cache, and each round's
    * one-row result is eagerly localCheckpointed — lineage stays flat in k
    * exactly like [[trainKMeansCells]]'s iteration hygiene.
    *
    * Determinism: distances are [[sqDistRounded]] (engine-portable), the
    * argmax tie-breaks on smaller `vec_id`, so the selection ORDER — and
    * with it the whole radius sequence — is oracle-checkable. `radius` at
    * step i is the farthest-point distance when center i was chosen: the
    * non-increasing coverage-radius curve (radius(i) bounds the true
    * k-center optimum for i centers within 2×).
    *
    * @return (ord: int, vec_id, radius: double) — ord 0 is the seed with
    *         radius 0 */
  def kCenterCoreset(corpus: DataFrame, k: Int): DataFrame = {
    import graft.CacheLifecycle.TrackedPersistOps
    require(k >= 1, s"k must be >= 1; got $k")
    val emb = corpus.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .persistTracked()
    val seed = emb.orderBy(col("vec_id")).limit(1)
      .select(lit(0).as("ord"), col("vec_id"),
        lit(0.0).as("radius"), col("emb").as("cent"))
      .localCheckpoint(true)
    val centers = (1 until k).foldLeft(seed) { (cents, i) =>
      val packed = cents.select(col("cent"))
        .groupBy().agg(collect_list(col("cent")).as("graft_cents"))
      val far = emb.crossJoin(broadcast(packed))
        .withColumn("dmin", array_min(transform(col("graft_cents"),
          c => sqDistRounded(col("emb"), c))))
        .orderBy(col("dmin").desc, col("vec_id"))
        .limit(1)
        .select(lit(i).as("ord"), col("vec_id"),
          col("dmin").as("radius"), col("emb").as("cent"))
      cents.unionByName(far).localCheckpoint(true)
    }
    centers.select(col("ord"), col("vec_id"), col("radius"))
  }

  /** Cosine-LSH candidate pairs within the corpus, exact-reranked to
    * similarity ≥ threshold. Multi-table banding (numTables independent
    * signatures of planesPerTable hyperplanes each): a pair is a candidate
    * if it collides in ANY table, so recall for a pair with angular
    * agreement p is 1-(1-p^planesPerTable)^numTables — tune tables up for
    * recall, planes up for precision. Candidates shuffle on (table,
    * bucket); vectors never pairwise-compare unless they collide. */
  def lshSimilarPairs(corpus: DataFrame, threshold: Double,
      numTables: Int = 8, planesPerTable: Int = 4,
      skewMaxBucket: Int = 4096, skewChunk: Int = 1024,
      eagerSkewProbe: Boolean = false): DataFrame = {
    // No persist here: hybridBucketPairs persists these rows itself, and
    // that cache is what every downstream consumer (the hot-bucket probe,
    // both self-join sides, the skew branch) reads.
    val tables = lshBucketTable(corpus, numTables, planesPerTable)

    // No pre-rerank distinct: deduping 1M candidates costs a full shuffle
    // to save re-scoring ~20% duplicate collisions — cheaper to rerank the
    // duplicates (codegen dot product) and dedup the tiny surviving set.
    // Hybrid bucket self-join: plain per-bucket pairs normally, the
    // fragment-replicate path for any bucket over skewMaxBucket rows.
    val candidates = Skew.hybridBucketPairs(tables, Seq("table_id", "bucket"),
        "vec_id", skewMaxBucket, skewChunk, eagerProbe = eagerSkewProbe)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"))

    val emb = corpus.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    candidates
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"),
        col("nrm").as("n_a")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"),
        col("nrm").as("n_b")), "vec_b")
      .withColumn("sim", round(
        dotProduct(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")), 6))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim"))
      .dropDuplicates("vec_a", "vec_b")
  }

  /** The hyperplane-LSH bucket relation (vec_id, table_id, bucket) —
    * [[lshSimilarPairs]]'s candidate-generation half, exposed so scoped
    * consumers (e.g. NeighborGraph.repair, which needs ONE node subset's
    * collisions against the corpus) can reuse the exact bucket
    * arithmetic without paying the full self-join.
    *
    * Plane dot products via posexplode + `planes` SUM agg columns: one
    * codegen'd hash aggregation instead of nested array-lambda folds
    * (which evaluate interpreted and re-derive plane components per dim).
    * Plane component (p, dim) is an integer Weyl-style mixer in
    * [-1024, 1024] — exact integer arithmetic any SQL engine reproduces,
    * so the DuckDB oracle can restate the buckets verbatim; executors need
    * no plane-matrix broadcast. Each per-plane term is scaled to a 1e-9
    * grid and floored to a long BEFORE summation: the sum is then exact
    * integer arithmetic — order-independent (double summation order varies
    * across engines and runs, and a sign flip on a near-zero dot product
    * would change a bucket) and long-backed (a decimal(28,12) route is
    * BigDecimal-boxed and ~3x slower in the hash aggregate). */
  def lshBucketTable(corpus: DataFrame, numTables: Int,
      planesPerTable: Int): DataFrame = {
    val planes = numTables * planesPerTable
    val comps = corpus.select(col("vec_id"),
      posexplode(asDouble(col("embedding"))).as(Seq("pos", "v")))
    val dotCols = (0 until planes).map { p =>
      val comp = ((col("pos") * 7919 + lit(p * 1000003)) * lit(2654435761L) % 2049L
        - 1024L).cast("double")
      sum(floor(col("v") * comp * 1e9).cast("long")).as(s"d$p")
    }
    val sigs = comps.groupBy("vec_id").agg(dotCols.head, dotCols.tail: _*)
    val tableCols = (0 until numTables).map { t =>
      val bucket = (0 until planesPerTable).map { i =>
        when(col(s"d${t * planesPerTable + i}") > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
      struct(lit(t).as("table_id"), bucket.as("bucket"))
    }
    sigs
      .select(col("vec_id"), explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("tb.table_id").as("table_id"),
        col("tb.bucket").as("bucket"))
  }
}
