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
    * rebuild decision. Callers own dedup of re-appended vec_ids, exactly
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
      m: Int, k: Int, nprobe: Int): DataFrame = {
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
    val cand = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probedCells: _*))
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
}
