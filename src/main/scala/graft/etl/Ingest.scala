package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extract + pivot stage (reference operators A2/A4/A5/A6).
  *
  * The reference fetches {"bitcoin":{"usd":x},...} and transposes the outer
  * map into rows with pandas `from_dict(orient='index')`
  * (/root/reference/dags/crypto-etl-pipeline-psql.py:51-56). Spark-first,
  * that pivot is a generator: `from_json` with an explicit MapType schema,
  * then `explode` (1 payload row → N coin rows), then a plain projection —
  * all codegen'd built-ins, no UDFs. The batch timestamp is stamped once on
  * the driver (the reference stamps one value per run, not per row; a
  * driver literal also keeps replays reproducible, matching XCom replay
  * semantics).
  */
object Ingest {

  /** Pivot one raw JSON payload into (crypto_id, price_usd, extracted_at)
    * rows, keeping only the requested quote currency.
    *
    * Fails fast on an empty/unparseable payload, mirroring the reference's
    * raise at /root/reference/dags/crypto-etl-pipeline-psql.py:45-46.
    */
  def pivotPrices(spark: SparkSession, rawJson: String, extractedAt: Timestamp,
      currency: String = "usd"): DataFrame = {
    import spark.implicits._
    val parsed = Seq(rawJson).toDF("body")
      .select(from_json($"body", Schemas.pricePayload).as("payload"))
      .select(explode($"payload").as(Seq("crypto_id", "quotes")))
      .select($"crypto_id",
        element_at($"quotes", currency).as("price_usd"),
        lit(extractedAt).as("extracted_at"))
    if (parsed.isEmpty)
      throw new IllegalArgumentException(
        s"empty or unparseable price payload: ${rawJson.take(80)}")
    parsed
  }

  /** Strict Postgres-REAL compat projection: the reference's sink column
    * is float4 (/root/reference/dags/crypto-etl-pipeline-psql.py:160),
    * while this engine standardizes on DoubleType (SURVEY.md §1.2). For
    * byte-compatible parity with the reference warehouse, narrow
    * `price_usd` through FloatType here — the same one-way precision loss
    * Postgres applies on INSERT. Round-tripping the float back to double
    * is exact IEEE widening, which is what makes the narrowed values
    * oracle-checkable cross-engine (q118). */
  def float4Compat(prices: DataFrame): DataFrame =
    prices.withColumn("price_usd", col("price_usd").cast("float"))

  /** Typed API boundary (SURVEY.md §1.3): the same pivot as a
    * Dataset[CryptoPrice] for consumers that want compile-time fields. */
  def pivotPricesTyped(spark: SparkSession, rawJson: String,
      extractedAt: Timestamp): org.apache.spark.sql.Dataset[CryptoPrice] = {
    import spark.implicits._
    pivotPrices(spark, rawJson, extractedAt).as[CryptoPrice]
  }

  /** File-source variant for tests and batch replay: a directory/file of
    * JSON payload lines. At scale this is the shape of an ingest landing
    * zone — one payload per poll, parallel parse on executors. */
  def readPricesJson(spark: SparkSession, path: String, extractedAt: Timestamp,
      currency: String = "usd"): DataFrame = {
    import spark.implicits._
    spark.read.text(path)
      .select(from_json($"value", Schemas.pricePayload).as("payload"))
      .select(explode($"payload").as(Seq("crypto_id", "quotes")))
      .select($"crypto_id",
        element_at($"quotes", currency).as("price_usd"),
        lit(extractedAt).as("extracted_at"))
  }

  /** Driver-side pre-flight, the A1 availability sensor
    * (/root/reference/dags/crypto-etl-pipeline-psql.py:143-151): bounded
    * retry loop around a caller-supplied probe — no executors are held
    * while waiting (the Spark analogue of Airflow's reschedule mode).
    * The probe abstracts the HTTP GET so tests inject responses. */
  def preflight(probe: () => Boolean, attempts: Int = 6,
      delayMillis: Long = 10000L): Boolean = {
    var i = 0
    while (i < attempts) {
      if (probe()) return true
      i += 1
      if (i < attempts) Thread.sleep(delayMillis)
    }
    false
  }
}
