package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator/capability from SURVEY.md §2; the
  * matching `oracleSql` entry is the ANSI/DuckDB SQL the driver runs over
  * the same parquet tables for the hash-compare correctness gate.
  */
object SparkEntry {

  private def packs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Relational.pack ++ Events.pack ++ PipelineQueries.pack ++ Text.pack ++
      Vectors.pack ++ Analytics.pack ++ Extended.pack

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
