package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Materialized IVF-PQ layout — the vector analogue of [[InvertedIndex]]:
  * pay coarse-quantizer training, cell assignment, and PQ encoding once
  * at INGEST, write the codes table `partitionBy(cell)`, and every later
  * ANN probe becomes a partition-pruned read of only the probed cells'
  * files plus two tiny sidecar tables (centroids, codebooks).
  *
  * This is the missing physical half of `Similarity.ivfPqTopK`: the
  * operator bounds WHICH vectors are scored (probed cells) and WHAT is
  * read per vector (m code longs, not d floats), but scores against an
  * in-plan codes table — the cell bound is applied by a join, so the
  * scan still reads every code. Writing the codes bucketed by cell turns
  * the bound into planning-time partition pruning: at 100 TB a
  * nprobe/kCells probe reads that fraction of the index's FILES, the
  * Jégou 2011 IVFADC contract from pure Spark primitives.
  *
  * Determinism: the trainers are the deterministic grid versions
  * (q122/q136 conventions), and a parquet round-trip of DOUBLE centroid
  * arrays and BIGINT codes is lossless — so the probe's answer is
  * bit-identical to the in-plan operator's and oracle-checkable by the
  * same SQL (q168 restates q141's oracle verbatim).
  */
object VectorIndex {

  /** Train coarse cells + PQ codebooks, encode, and write the layout:
    * `codes/` partitioned by cell, `centroids/` + `codebooks/` sidecars. */
  def build(emb: DataFrame, path: String, kCells: Int, cellIters: Int,
      m: Int, kCw: Int, pqIters: Int): Unit = {
    val cent = Similarity.trainKMeansCells(emb, k = kCells, iters = cellIters)
    val cells = Similarity.assignKMeansCells(emb, cent)
      .select(col("vec_id"), col("cell"))
    val cb = Similarity.trainPqCodebooks(emb, m = m, k = kCw, iters = pqIters)
    val codes = Similarity.pqEncode(emb, cb, m = m)
    codes.join(cells, "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    cent.write.mode("overwrite").parquet(s"$path/centroids")
    cb.write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Incremental ANN maintenance: absorb a batch of NEW embeddings into
    * an existing layout — the [[InvertedIndex.append]] contract applied
    * to vectors. New vectors are assigned to the EXISTING coarse cells
    * and PQ-encoded with the EXISTING codebooks (both read back from the
    * sidecars, so an append cannot disagree with the built layout's
    * parameters — m is derived from the codebook table itself, the
    * vector twin of the inverted index's `_graft_meta` guard), and the
    * resulting codes are APPENDED under only the touched cell
    * partitions: existing code files are never rewritten, and probes see
    * old and new vectors identically (partition filters select
    * directories, not write generations). At 100 TB this is the
    * difference between an ANN index that is a servable, refreshable
    * artifact and one that is an offline build: an ingest batch costs
    * assign+encode on the batch, not a corpus retrain+rewrite. Quantizer
    * retraining on distribution drift stays an explicit, separate
    * rebuild decision — [[maintenancePlan]] is the front door that makes
    * it per batch. Callers own dedup of re-appended vec_ids, exactly
    * as with the inverted index's append-only postings log. */
  def append(spark: SparkSession, newEmb: DataFrame, path: String): Unit = {
    val cent = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebooks")
    // one-row driver aggregate over the m·kCw-row sidecar — bounded by
    // construction (the Upsert collect convention)
    val m = cb.agg(max(col("sub"))).head.getAs[Number](0).intValue + 1
    val cells = Similarity.assignKMeansCells(newEmb, cent)
      .select(col("vec_id"), col("cell"))
    val codes = Similarity.pqEncode(newEmb, cb, m = m)
    codes.join(cells, "vec_id")
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
  }

  /** Maintenance decision: the documented FRONT DOOR to [[append]] vs
    * [[build]] — per ingest batch, an append-vs-retrain verdict from the
    * two signals the index already exposes: CENTROID DRIFT (q203's
    * snapped squared L2 between the batch's mean vector and the index's
    * code-count-weighted centroid mean — a batch from a shifted
    * distribution quantizes badly against stale cells) and PROJECTED
    * CELL BALANCE (q215's load factor with the batch's assignments added
    * in — a batch that would pile onto one cell defeats the layout's
    * partition pruning even if it is in-distribution). `append` absorbs
    * the batch incrementally; `retrain` says pay the [[build]] rebuild.
    *
    * Everything is sidecar- or batch-sized: the index mean weighs the
    * kCells centroid rows by per-cell code counts (one grid-sized agg
    * over the codes table — at 100 TB that is the partition footer
    * statistic, not a vector scan), the batch mean and assignment scan
    * only the batch, and the decision grid is batches × kCells rows.
    * Exactness: means route decimal(18,9) before ONE double division and
    * a 1e-6 snap (the q203 convention); drift is [[Similarity.sqDistRounded]]
    * on snapped inputs; the load test is a pure integer inequality
    * (max_proj · k > loadFactorMax · (n_index + n_batch)) — no float
    * threshold can straddle engines.
    *
    * @param batches (batch_id, vec_id, embedding) — each batch_id judged
    *                independently against the current layout
    * @return (batch_id, n_new, drift_sq, max_proj, drift_flag, load_flag,
    *         decision) — decision ∈ {append, retrain}
    */
  def maintenancePlan(spark: SparkSession, path: String, batches: DataFrame,
      driftSqMax: Double, loadFactorMax: Long): DataFrame = {
    val cent = spark.read.parquet(s"$path/centroids")
    // kCells-row sidecar — bounded driver constant (the Upsert convention)
    val k = cent.count()
    val cc = spark.read.parquet(s"$path/codes")
      .groupBy(col("cell")).agg(count(lit(1)).as("n_cell"))
    val tot = cc.agg(sum(col("n_cell")).as("n_idx"))
    val idxMean = cent.join(cc, "cell")
      .select(col("n_cell"), posexplode(col("centroid")).as(Seq("pos", "cv")))
      .groupBy(col("pos"))
      .agg(round(sum(col("cv").cast("decimal(18,9)") * col("n_cell"))
        .cast("double") / sum(col("n_cell")), 6).as("imv"))
      .groupBy().agg(array_sort(collect_list(struct(col("pos"), col("imv"))))
        .getField("imv").as("im"))
    val bEmb = batches.select(col("batch_id"), col("vec_id"),
      graft.functions.VectorFunctions.asDouble(col("embedding")).as("embedding"))
    val bMean = bEmb
      .select(col("batch_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("batch_id"), col("pos"))
      .agg(round(sum(col("v").cast("decimal(18,9)")).cast("double")
        / count(lit(1)), 6).as("bv"))
      .groupBy(col("batch_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("bv"))))
        .getField("bv").as("bm"))
    val drift = bMean.crossJoin(broadcast(idxMean)) // one-row right side
      .select(col("batch_id"),
        Similarity.sqDistRounded(col("bm"), col("im")).as("drift_sq"))
    val bCell = Similarity.assignKMeansCells(bEmb, cent)
      .groupBy(col("batch_id"), col("cell")).agg(count(lit(1)).as("n_b"))
    val bn = bEmb.groupBy(col("batch_id")).agg(count(lit(1)).as("n_new"))
    val proj = bn.select(col("batch_id"))
      .crossJoin(broadcast(cent.select(col("cell")))) // batches × kCells grid
      .join(broadcast(cc), Seq("cell"), "left")
      .join(broadcast(bCell), Seq("batch_id", "cell"), "left")
      .groupBy(col("batch_id"))
      .agg(max(coalesce(col("n_cell"), lit(0L))
        + coalesce(col("n_b"), lit(0L))).as("max_proj"))
    bn.join(broadcast(drift), "batch_id")
      .join(broadcast(proj), "batch_id")
      .crossJoin(broadcast(tot)) // one row
      .select(col("batch_id"), col("n_new"), col("drift_sq"), col("max_proj"),
        (col("drift_sq") > lit(driftSqMax)).as("drift_flag"),
        (col("max_proj") * lit(k)
          > lit(loadFactorMax) * (col("n_idx") + col("n_new"))).as("load_flag"))
      .withColumn("decision",
        when(col("drift_flag") || col("load_flag"), "retrain")
          .otherwise("append"))
      .orderBy(col("batch_id"))
  }

  /** ANN top-k against a built layout. The probe set — each query's
    * nprobe nearest cells by the same rounded squared L2 the assignment
    * used — is computed against the centroid sidecar (kCells rows) and
    * its DISTINCT cells are collected driver-side so the codes filter is
    * a literal IN list: that is what lets Catalyst prune partitions at
    * planning time (a join would not). The collect is bounded by kCells —
    * the coarse quantizer is driver-sized by construction (the
    * Upsert.scala bounded-collect convention), never corpus-sized.
    *
    * @return (query_id, neighbor_id, rank, adist) — `Similarity.pqTopK`
    *         semantics within probed cells */
  def probeTopK(spark: SparkSession, path: String, queries: DataFrame,
      m: Int, k: Int, nprobe: Int): DataFrame =
    probeTopKWhere(spark, path, queries, m, k, nprobe, allowed = None)

  /** Metadata-filtered ADC probe — [[probeTopK]] with the predicate
    * applied DURING the scan, not after the top-k (post-filtering
    * under-returns: k survivors of a filter over k rows is k·selectivity,
    * not k). `allowed` is a one-column vec_id relation — the predicate
    * pushed into a metadata scan — semi-joined against the probed cells'
    * codes BEFORE the LUT scoring, so non-matching vectors cost nothing
    * past the join and the ranking sees every admissible candidate in the
    * probed cells. Partition pruning is unchanged (cells come from the
    * query, not the predicate); at 100 TB the filter relation is
    * metadata-sized next to the codes it gates. */
  def probeTopKWhere(spark: SparkSession, path: String, queries: DataFrame,
      m: Int, k: Int, nprobe: Int, allowed: Option[DataFrame]): DataFrame =
    probeTopKArms(spark, path, queries, m, k, nprobe,
      Seq(("only", allowed))).drop("arm")

  /** [[probeTopKWhere]] for SEVERAL predicates at once: the layout reads,
    * probe-cell selection, LUT build, and partition-pruned codes scan —
    * everything except the final admit-and-rank — run ONCE and each
    * named arm ranks its own filtered answer. An arm with `None` ranks
    * unfiltered. The serving shape for answering one query batch under
    * many tenant/label filters.
    * @return (arm, query_id, neighbor_id, rank, adist) */
  def probeTopKArms(spark: SparkSession, path: String, queries: DataFrame,
      m: Int, k: Int, nprobe: Int,
      arms: Seq[(String, Option[DataFrame])]): DataFrame = {
    val cent = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebooks")
    val q = queries.select(col("vec_id").as("query_id"),
      graft.functions.VectorFunctions.asDouble(col("embedding")).as("q_emb"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cd", Similarity.sqDistRounded(col("q_emb"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cd").asc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cell"))
    // ≤ kCells literals — the partition-pruning filter
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getAs[Number](0).longValue).sorted.toSeq
    val qSubs = q.select(col("query_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          Similarity.subSlice(col("q_emb"), s, m).as("se"))): _*)).as("x"))
      .select(col("query_id"), col("x.sub").as("sub"), col("x.se").as("se"))
    val lut = qSubs
      .join(broadcast(cb.select(col("sub"), col("cw"), col("centroid"))), "sub")
      .select(col("query_id"), col("sub"), col("cw"),
        Similarity.sqDistRounded(col("se"), col("centroid")).as("dist"))
    val pruned = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probedCells: _*))
    arms.map { case (name, allowed) =>
      val admissible = allowed match {
        case Some(a) => pruned.join(a.select(col("vec_id")),
          Seq("vec_id"), "left_semi")
        case None => pruned
      }
      val cand = admissible
        .join(broadcast(probes), "cell")
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          posexplode(col("codes")).as(Seq("sub", "cw")))
      val scored = cand.join(broadcast(lut), Seq("query_id", "sub", "cw"))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(sum(col("dist").cast("decimal(18,6)")).cast("double").as("adist"))
      scored.withColumn("rank", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("adist").asc, col("neighbor_id"))))
        .filter(col("rank") <= k)
        .select(lit(name).as("arm"), col("query_id"), col("neighbor_id"),
          col("rank"), col("adist"))
    }.reduce(_ unionByName _)
  }
}
