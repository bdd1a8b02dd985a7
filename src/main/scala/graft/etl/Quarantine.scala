package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Malformed-input quarantine (generalizing reference operator A2's
  * fail-fast parse).
  *
  * The reference parses each API body with a bare `json.loads` and raises
  * on an empty payload (/root/reference/dags/crypto-etl-pipeline-psql.py:
  * 45-46,177) — one malformed response kills the hourly run. At 100 TB of
  * scraped JSON/CSV that policy is unusable: some fraction of every batch
  * is ALWAYS malformed, and the pipeline's job is to count and retain the
  * failures, not die on the first one. Spark-first this is PERMISSIVE
  * `from_json`/`from_csv` with a `_corrupt_record` column: clean rows
  * project into the typed schema, malformed rows keep their raw payload
  * verbatim in the quarantine column (null fields otherwise) — one
  * codegen'd projection, no second parse pass, no driver involvement.
  * `stats` rolls parse outcomes up per source, and `gate` feeds the worst
  * source into the QualityGate severity ladder (A9/A10's warn/fail shape),
  * so a batch whose quarantine ratio spikes fails loudly WITH its evidence
  * retained instead of silently nulling (from_json's default) or dying on
  * row one (the reference's raise).
  */
object Quarantine {

  val CorruptCol = "_corrupt_record"

  /** The user's payload schema plus the quarantine column Spark's
    * PERMISSIVE mode writes raw malformed payloads into. */
  def withQuarantineSchema(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(StructField(CorruptCol, StringType, nullable = true))

  private def opts: Map[String, String] =
    Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)

  /** PERMISSIVE JSON parse: adds `parsedCol`, a struct of `schema`'s
    * fields plus `_corrupt_record` (raw payload when malformed, null when
    * clean). Never throws on bad input; never drops a row. */
  def parseJson(df: DataFrame, jsonCol: String, schema: StructType,
      parsedCol: String = "parsed"): DataFrame =
    df.withColumn(parsedCol,
      from_json(col(jsonCol), withQuarantineSchema(schema), opts))

  /** PERMISSIVE CSV parse, same contract as [[parseJson]]. */
  def parseCsv(df: DataFrame, csvCol: String, schema: StructType,
      parsedCol: String = "parsed",
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    df.withColumn(parsedCol,
      from_csv(col(csvCol), withQuarantineSchema(schema),
        opts ++ extraOptions))

  /** True when the parsed row was quarantined: the corrupt column is set,
    * or the whole payload was null (from_json yields a null struct for
    * null input, which PERMISSIVE mode never flags). */
  def isQuarantined(parsedCol: String = "parsed"): Column =
    col(parsedCol).isNull || col(s"$parsedCol.$CorruptCol").isNotNull

  /** Per-source parse outcomes: n_total / n_parsed / n_quarantined, the
    * quarantine ratio in ppm (exact decimal route), and a gate_status
    * severity ('ok' | 'warn' | 'fail') from the ppm thresholds. One
    * partial+final aggregation over the batch — the scale shape is a
    * source-keyed count rollup, never a second parse. `extraAggs` lets a
    * caller prove extraction (e.g. a SUM over a parsed field) in the same
    * pass. */
  def stats(df: DataFrame, sourceCol: String, parsedCol: String = "parsed",
      warnPpm: Long = 10000L, failPpm: Long = 100000L,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val q = isQuarantined(parsedCol)
    val aggs = Seq(
      count(lit(1)).as("n_total"),
      sum(when(q, 0L).otherwise(1L)).as("n_parsed"),
      sum(when(q, 1L).otherwise(0L)).as("n_quarantined")) ++ extraAggs
    df.groupBy(col(sourceCol).as("source"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("quarantine_ppm", expr(
        "cast(cast(n_quarantined as decimal(38,0)) * 1000000 div n_total as bigint)"))
      .withColumn("gate_status",
        when(col("quarantine_ppm") >= failPpm, lit("fail"))
          .when(col("quarantine_ppm") >= warnPpm, lit("warn"))
          .otherwise(lit("ok")))
  }

  /** Feed per-source stats into the QualityGate severity ladder: Fail
    * trumps Warn trumps Pass (A9/A10's enforcement shape). Driver-side
    * collect is bounded by the number of SOURCES, not rows. */
  def gate(statsDf: DataFrame): QualityGate.GateResult = {
    val rows = statsDf.select(col("source"), col("gate_status"),
      col("quarantine_ppm")).collect()
    val fails = rows.filter(_.getString(1) == "fail")
    val warns = rows.filter(_.getString(1) == "warn")
    if (fails.nonEmpty)
      QualityGate.Fail(fails.map(r =>
        s"${r.getString(0)}: ${r.getLong(2)}ppm quarantined").mkString("; "))
    else if (warns.nonEmpty)
      QualityGate.Warn(warns.map(r =>
        s"${r.getString(0)}: ${r.getLong(2)}ppm quarantined").mkString("; "))
    else QualityGate.Pass
  }
}
