package graft.operators

import graft.CacheLifecycle.TrackedPersistOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR data selection (Xie et al. 2023, arXiv:2302.03169 — "Data
  * Selection for Language Models via Importance Resampling"; PAPERS.md):
  * score every raw document by how target-like its hashed n-gram profile
  * is,
  *
  *   log w(d) = Σ_f c_d(f) · ( ln p_T(f) − ln p_R(f) )
  *
  * over hashed unigram+bigram features f with Laplace-smoothed bucket
  * frequencies p(f) = (count(f) + 1) / (total + B). High-weight documents
  * are the ones a target-domain resample keeps.
  *
  * Determinism/portability (the repo's oracle conventions):
  *  - features hash through md5 (identical hex in Spark and DuckDB; q90's
  *    portable-hash idiom) into B buckets; unigrams and bigrams are
  *    disambiguated by "u|"/"b|" prefixes before hashing.
  *  - all counts are exact integers; each bucket's log-ratio is snapped
  *    once to the 1e-9 integer grid (q106/q120 convention), so per-doc
  *    scores are exact integer dot products — engine-independent, and
  *    `logw_e9` gives callers a total order with no float ties.
  *
  * Scale: features explode linearly (one lead() window per doc for
  * bigrams); per-doc bucket counts shuffle on (doc, bucket); the
  * bucket-ratio table is B rows (default 4096) — broadcast onto the
  * per-doc counts, so scoring adds no extra shuffle beyond the per-doc
  * rollup. The target profile needs no separate corpus pass: one
  * conditional aggregation splits target/raw counts.
  *
  * @param isTarget boolean column over `docs` marking the target domain
  *                 (e.g. `col("lang") === "en"`, or a holdout-set flag)
  * @return (doc_id, n_feats, logw_e9, logw) for EVERY input document;
  *         resampling = ORDER BY logw_e9 DESC LIMIT k (or Gumbel top-k
  *         for the stochastic variant)
  */
object Dsir {
  import graft.functions.TextFunctions.tokens

  def importanceWeights(docs: DataFrame, isTarget: Column,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2; got $buckets")
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val feats = docs
      .select(col(idCol).as("doc_id"), posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(wOrd))
      .select(col("doc_id"), explode(array(
        concat(lit("u|"), col("tok")),
        when(col("t1").isNotNull,
          concat_ws(" ", concat(lit("b|"), col("tok")), col("t1"))))).as("f"))
      .filter(col("f").isNotNull)
    // persisted: consumed twice (profile build + scoring join) — without
    // it the whole tokenize→window→md5 feature pipeline runs twice
    val dc = feats
      .select(col("doc_id"),
        (conv(substring(md5(col("f")), 1, 14), 16, 10).cast("long") % buckets).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
      .persistTracked()
    val flags = docs.select(col(idCol).as("doc_id"), isTarget.as("tgt"))
    val bc = dc.join(flags, "doc_id")
      .groupBy(col("b"))
      .agg(sum(when(col("tgt"), col("c")).otherwise(lit(0L))).as("ct"),
        sum(col("c")).as("cr"))
    val tot = bc.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val ratio = bc.crossJoin(broadcast(tot))
      .select(col("b"),
        round((log((col("ct") + lit(1.0)) / (col("tt") + lit(buckets.toDouble))) -
               log((col("cr") + lit(1.0)) / (col("tr") + lit(buckets.toDouble)))) * lit(1e9))
          .cast("long").as("r9"))
    dc.join(broadcast(ratio), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_feats"), sum(col("c") * col("r9")).as("logw_e9"))
      .select(col("doc_id"), col("n_feats"), col("logw_e9"),
        (col("logw_e9").cast("double") / lit(1e9)).as("logw"))
  }

  /** The RESAMPLING step of importance resampling: Gumbel-top-k over the
    * log-weights — drawing k documents WITHOUT replacement with
    * probability ∝ w(d)^(1/temperature) is exactly taking the k largest
    * logw/T + Gumbel(0,1) keys (the Gumbel-max trick). The noise is
    * derived, not drawn: u = hashed-uniform of (seed, doc_id) via the
    * portable md5 idiom, g = −ln(−ln u) — so the sample is reproducible
    * across engines and runs, shardable (pure per-row expression, no
    * global RNG state), and changes wholesale with `seed`.
    *
    * Keys stay on the 1e-9 integer grid (g snapped once, like the ratio
    * table), so the top-k cut point is exact with a doc_id tiebreak.
    * Plan: one per-row projection + TakeOrderedAndProject — no shuffle
    * beyond the per-partition top-k merge. */
  def gumbelTopK(weights: DataFrame, k: Int, seed: String = "dsir",
      temperature: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    require(temperature > 0, s"temperature must be > 0; got $temperature")
    val m = 1 << 20
    val u = (conv(substring(md5(concat_ws("|", lit(seed), col("doc_id"))), 1, 14), 16, 10)
      .cast("long") % m + lit(0.5)) / lit(m.toDouble)
    val g9 = round(-log(-log(u)) * lit(1e9)).cast("long")
    // temperature 1 keeps pure integer addition (no rounding semantics to
    // align across engines); other temperatures scale the weight first
    val scaled =
      if (temperature == 1.0) col("logw_e9")
      else round(col("logw_e9") / lit(temperature)).cast("long")
    weights.withColumn("key_e9", scaled + g9)
      .orderBy(col("key_e9").desc, col("doc_id"))
      .limit(k)
  }
}
