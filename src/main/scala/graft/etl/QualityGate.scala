package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate (reference operators A9/A10).
  *
  * Re-expresses the Soda checks at /root/reference/include/soda/checks.yml:
  *   - min(price_usd) >= 0, else FAIL (aborts the pipeline, enforcement at
  *     /root/reference/dags/crypto-etl-pipeline-psql.py:129-130)
  *   - freshness(extracted_at): WARN when > 2h stale, FAIL when > 6h stale
  * plus the PK-uniqueness invariant the Postgres DDL enforced implicitly.
  *
  * Everything is one aggregation pass over the table (no per-check scans —
  * Soda issues one SQL query per check; here Catalyst fuses all metrics
  * into a single partial+final agg). `now` is an explicit parameter so runs
  * are reproducible and oracle-checkable.
  */
object QualityGate {

  sealed trait GateResult { def message: String }
  case object Pass extends GateResult { val message = "pass" }
  final case class Warn(message: String) extends GateResult
  final case class Fail(message: String) extends GateResult

  final case class Metrics(minPrice: Option[Double], maxExtractedAt: Option[Timestamp],
      rowCount: Long, duplicateKeys: Long)

  private def ag(df: DataFrame, valueCol: String, tsCol: String,
      keys: Seq[String]): Metrics = {
    val dupes = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
    val row = df.agg(
      min(col(valueCol)).as("min_v"),
      max(col(tsCol)).as("max_ts"),
      count(lit(1)).as("n")).head()
    Metrics(
      if (row.isNullAt(0)) None else Some(row.getDouble(0)),
      if (row.isNullAt(1)) None else Some(row.getTimestamp(1)),
      row.getLong(2), dupes)
  }

  /** Evaluate the gate. Severity ladder identical to the reference:
    * Fail trumps Warn trumps Pass. */
  def evaluate(df: DataFrame, now: Timestamp,
      valueCol: String = "price_usd", tsCol: String = "extracted_at",
      keys: Seq[String] = Schemas.priceKeys,
      warnAfterHours: Long = 2, failAfterHours: Long = 6,
      failBelowValue: Double = 0.0): GateResult = {
    val m = ag(df, valueCol, tsCol, keys)
    if (m.rowCount == 0L) return Fail("empty table")
    if (m.minPrice.exists(_ < failBelowValue))
      return Fail(s"min($valueCol) = ${m.minPrice.get} < $failBelowValue")
    if (m.duplicateKeys > 0)
      return Fail(s"${m.duplicateKeys} duplicate (${keys.mkString(",")}) keys")
    val staleHours = m.maxExtractedAt
      .map(ts => (now.getTime - ts.getTime) / 3600000L).getOrElse(Long.MaxValue)
    if (staleHours > failAfterHours)
      Fail(s"stale: ${staleHours}h > ${failAfterHours}h")
    else if (staleHours > warnAfterHours)
      Warn(s"stale: ${staleHours}h > ${warnAfterHours}h")
    else Pass
  }

  /** Throw on Fail — the pipeline-abort semantics of the reference's
    * `raise` at dags/crypto-etl-pipeline-psql.py:129-130. Warn passes
    * through (reference logs and continues). */
  def enforce(df: DataFrame, now: Timestamp): GateResult =
    evaluate(df, now) match {
      case f: Fail => throw new IllegalStateException(s"quality gate failed: ${f.message}")
      case r => r
    }

  /** Zero-extra-pass gate: metrics ride along the main action via
    * `df.observe` (a CollectMetrics node in the same plan), so the gate
    * costs nothing beyond the write/aggregation the pipeline already runs —
    * the Soda re-scan of the reference
    * (dags/crypto-etl-pipeline-psql.py:109-130) collapses into the load
    * itself. Usage: attach, run your action on the returned frame, then
    * [[observedResult]]. */
  def attachObservation(df: DataFrame, valueCol: String = "price_usd",
      tsCol: String = "extracted_at"): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      min(col(valueCol)).as("min_value"),
      max(col(tsCol)).as("max_ts"),
      count(lit(1)).as("n_rows"))
    (observed, obs)
  }

  /** Evaluate the severity ladder from a completed observation (the
    * duplicate-key check needs its own aggregation and is not part of the
    * ride-along metrics). */
  def observedResult(obs: org.apache.spark.sql.Observation, now: Timestamp,
      warnAfterHours: Long = 2, failAfterHours: Long = 6): GateResult = {
    val m = obs.get
    val n = m("n_rows").asInstanceOf[Long]
    if (n == 0L) return Fail("empty table")
    val minV = Option(m("min_value")).map(_.asInstanceOf[Double])
    if (minV.exists(_ < 0)) return Fail(s"min = ${minV.get} < 0")
    val staleHours = Option(m("max_ts")).map(_.asInstanceOf[Timestamp])
      .map(ts => (now.getTime - ts.getTime) / 3600000L).getOrElse(Long.MaxValue)
    if (staleHours > failAfterHours) Fail(s"stale: ${staleHours}h > ${failAfterHours}h")
    else if (staleHours > warnAfterHours) Warn(s"stale: ${staleHours}h > ${warnAfterHours}h")
    else Pass
  }

  /** The gate metrics as a one-row DataFrame — the oracle-checkable form,
    * and the shape a `df.observe()` listener would record in streaming. */
  def metricsDf(df: DataFrame, now: Timestamp, valueCol: Column, tsEpochS: Column,
      warnAfterHours: Long = 2, failAfterHours: Long = 6): DataFrame = {
    val nowS = now.getTime / 1000L
    df.agg(
      min(valueCol).as("min_value"),
      max(tsEpochS).as("max_epoch_s"),
      count(lit(1)).as("n_rows"))
      .select(
        col("min_value"), col("n_rows"),
        date_format(timestamp_seconds(col("max_epoch_s")), "yyyy-MM-dd HH:mm:ss")
          .as("max_ts"),
        // floor(double) rather than a long cast: Spark's cast truncates,
        // DuckDB's rounds — floor agrees in both engines.
        floor((lit(nowS) - col("max_epoch_s")) / 3600.0).cast("long").as("hours_stale"))
      .withColumn("status",
        when(col("min_value") < 0 || col("hours_stale") > failAfterHours, "fail")
          .when(col("hours_stale") > warnAfterHours, "warn")
          .otherwise("pass"))
  }
}
