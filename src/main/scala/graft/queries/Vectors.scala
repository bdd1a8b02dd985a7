package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.{Multimodal, Similarity}

/** Similarity-search + multimodal pack over `embeddings` and `documents`
  * (SURVEY.md §2 Tier B north-star rows).
  *
  * q50 (brute-force ANN baseline) and the stats/centroid queries are
  * oracle-checked against DuckDB list arithmetic; the IVF and LSH variants
  * are the scale path (probed cells / hashed buckets instead of full
  * scans) and are validated against the brute-force baseline in tests
  * rather than SQL (their pruning uses Spark-internal hashes).
  */
object Vectors {
  import Q._

  // --- q50: exact top-5 cosine neighbors for 8 query vectors --------------
  def q50(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb.filter($"vec_id" < 8), emb, k = 5)
      .orderBy($"query_id", $"rank")
  }
  val q50Sql: String =
    """SELECT query_id, neighbor_id, rank, sim FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    ROUND(list_inner_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
      |      / (sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
      |         * sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS sim,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
      |      ROUND(list_inner_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
      |        / (sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
      |           * sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) DESC,
      |      c.vec_id) AS rank
      |  FROM embeddings q JOIN embeddings c ON q.vec_id < 8 AND q.vec_id <> c.vec_id)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // --- q51: per-label embedding statistics --------------------------------
  def q51(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .withColumn("norm", l2Norm($"embedding"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        max(size($"embedding")).as("dim"),
        // round(6): the decimal(18,9) snap of arbitrary doubles can differ
        // between engines by one last-digit unit near rounding boundaries
        // (Spark rounds the exact binary expansion, DuckDB multiply+llround)
        // — the final rounding gives ~1e5x margin over that noise.
        round(sum($"norm".cast("decimal(18,9)")).cast("double") / count(lit(1)), 6)
          .as("avg_norm"))
      .orderBy($"label")
  }
  val q51Sql: String =
    """SELECT label, COUNT(*) AS n_vecs,
      |  MAX(len(embedding)) AS dim,
      |  ROUND(CAST(SUM(CAST(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      |    AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
      |FROM embeddings
      |GROUP BY label
      |ORDER BY label""".stripMargin

  // --- q52: per-label centroids (per-dimension means) ---------------------
  // posexplode → (label, dim) grouping: the shuffle key is (label, pos), so
  // centroid math parallelizes over label×dim cells, not whole vectors.
  def q52(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"label", posexplode(asDouble($"embedding")).as(Seq("pos", "v")))
      .groupBy($"label", $"pos")
      // round(6) margin over decimal-snap boundary noise — see q51 note
      .agg(round(sum($"v".cast("decimal(18,9)")).cast("double") / count(lit(1)), 6)
        .as("centroid_v"))
      .orderBy($"label", $"pos")
  }
  val q52Sql: String =
    """SELECT label, pos,
      |  ROUND(CAST(SUM(CAST(v AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS centroid_v
      |FROM (
      |  SELECT label,
      |    unnest(range(0, len(embedding))) AS pos,
      |    unnest(embedding::DOUBLE[]) AS v
      |  FROM embeddings)
      |GROUP BY label, pos
      |ORDER BY label, pos""".stripMargin

  // --- q53: IVF approximate nearest neighbors (scale path; rows-only) -----
  // Coarse cells = label attribute (stand-in for k-means cells), probe 3 of
  // 10 cells → ~70% of the corpus never scanned. Recall vs q50 is asserted
  // in VectorSpec.
  def q53(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb.filter($"vec_id" < 8), emb, $"label", k = 5, nprobe = 3)
      .orderBy($"query_id", $"rank")
  }

  // --- q54: cosine-LSH similar pairs (rows-only) --------------------------
  // Random embeddings have no cluster structure, so bucket pruning is
  // recall-bounded here (see SimilaritySpec for recall on structured data);
  // 5-plane tables keep the demo's candidate volume ~6x below all-pairs.
  def q54(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Similarity.lshSimilarPairs(Tables.embeddings(s, d), threshold = 0.3,
      numTables = 6, planesPerTable = 5)
      .orderBy($"vec_a", $"vec_b")
  }

  // --- q55: multimodal payload decode (mapPartitions stub) ----------------
  def q55(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Multimodal.attachPayload(Tables.documents(s, d))
    Multimodal.decodeStub(s, docs).toDF()
      .orderBy($"doc_id")
  }
  val q55Sql: String =
    """SELECT doc_id,
      |  CAST(strlen(text) AS INT) AS byte_len,
      |  CAST(strlen(text) % 640 AS INT) AS fake_width,
      |  CAST((strlen(text) * 7) % 480 AS INT) AS fake_height,
      |  lang
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  def pack: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q50_knn_bruteforce", q50 _, Some(q50Sql)),
    ("q51_vector_stats", q51 _, Some(q51Sql)),
    ("q52_centroids", q52 _, Some(q52Sql)),
    ("q53_knn_ivf", q53 _, None),
    ("q54_lsh_pairs", q54 _, None),
    ("q55_multimodal_decode", q55 _, Some(q55Sql)))
}
