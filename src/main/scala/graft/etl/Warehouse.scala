package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse catalog management (reference operator A3: `CREATE TABLE IF
  * NOT EXISTS crypto_prices(...)`,
  * /root/reference/dags/crypto-etl-pipeline-psql.py:154-165).
  *
  * The session catalog gets an external parquet table over an explicit
  * location, so `spark.sql`/`spark.table` analytics (the Metabase entry
  * point) and the path-based pipeline sinks see the same data. The
  * reference's composite PRIMARY KEY has no catalog equivalent in Spark —
  * it is enforced operationally by the [[Upsert]] sink plus the
  * [[QualityGate]] uniqueness check.
  */
object Warehouse {

  val cryptoPricesDdl: String =
    "crypto_id STRING, price_usd DOUBLE, extracted_at TIMESTAMP"

  /** Idempotent ensure, like the reference's IF NOT EXISTS. */
  def ensureTable(spark: SparkSession, table: String, location: String,
      columnsDdl: String = cryptoPricesDdl): Unit =
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $table ($columnsDdl) USING parquet " +
        s"LOCATION '$location'")

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
