package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Benchmark decontamination for training corpora: flag corpus documents
  * that share word n-grams with a held-out evaluation set (the standard
  * n-gram-overlap decontamination check run before training on scraped
  * text).
  *
  * Scale design: grams travel as 16-hex-char md5 prefixes (portable to the
  * SQL oracle, 64 bits of collision resistance), one row per distinct
  * (doc, gram). The holdout side of the probe is an eval benchmark —
  * orders of magnitude smaller than the corpus — so its distinct gram set
  * is broadcast and the corpus side streams through a map-side left join:
  * the only shuffle is the final per-document count aggregation on doc_id.
  * At 100 TB the corpus gram generation is embarrassingly parallel
  * (posexplode + lead windows, one shuffle on doc_id shared with the
  * count).
  */
object Decontaminate {

  /** Distinct hashed word n-grams, one row per (doc_id, g). Shingling via
    * posexplode + lead() windows — fully codegen (the array-HOF
    * alternatives evaluate interpreted, see Dedup.shingleHashRows). */
  private[graft] def gramRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val tokRows = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val withLeads = (1 until n).foldLeft(tokRows)((df, i) =>
      df.withColumn(s"t$i", lead(col("tok"), i).over(wOrd)))
    val gramCols = col("tok") +: (1 until n).map(i => col(s"t$i"))
    withLeads
      .filter(col(s"t${n - 1}").isNotNull)
      .select(col("doc_id"),
        substring(md5(concat_ws(" ", gramCols: _*)), 1, 16).as("g"))
      .distinct()
  }

  /** Corpus documents contaminated by the holdout set: every corpus doc
    * sharing ≥ 1 distinct n-gram with ANY holdout doc, with its distinct
    * gram count, the number of grams that hit, and the hit fraction.
    * Output: (doc_id, n_grams, n_hits, hit_frac), contaminated docs only.
    */
  def ngramOverlap(corpus: DataFrame, holdout: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val corpusGrams = gramRows(corpus, idCol, textCol, n)
    val holdGrams = gramRows(holdout, idCol, textCol, n)
      .select(col("g")).distinct()
      .withColumn("__hit", lit(1))
    corpusGrams
      .join(broadcast(holdGrams), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hits"))
      .filter(col("n_hits") > 0)
      .withColumn("hit_frac", col("n_hits") / col("n_grams"))
  }
}
