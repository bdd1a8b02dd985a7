package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Warehouse schema of the reference's fact table.
  *
  * Mirrors the DDL at /root/reference/dags/crypto-etl-pipeline-psql.py:157-164
  * — crypto_prices(crypto_id TEXT, price_usd REAL, extracted_at TIMESTAMP,
  * PRIMARY KEY (crypto_id, extracted_at)). Postgres REAL is float4 but the
  * source JSON carries doubles, so the engine standardizes on DoubleType
  * (SURVEY.md §1.2). The composite PK has no catalog equivalent in Spark;
  * it is enforced by the insert-if-absent sink ([[Upsert]]) plus the
  * uniqueness check in [[QualityGate]].
  */
object Schemas {
  val priceKeys: Seq[String] = Seq("crypto_id", "extracted_at")

  val cryptoPrices: StructType = StructType(Seq(
    StructField("crypto_id", StringType, nullable = false),
    StructField("price_usd", DoubleType, nullable = true),
    StructField("extracted_at", TimestampType, nullable = false)))

  /** Shape of the CoinGecko /simple/price payload the reference parses at
    * /root/reference/dags/crypto-etl-pipeline-psql.py:171-177:
    * {"bitcoin": {"usd": 67000.1}, ...} — map coin → {currency → price}.
    * An explicit MapType (never schema inference) so unknown currencies
    * survive and projection stays declarative. */
  val pricePayload: MapType =
    MapType(StringType, MapType(StringType, DoubleType))
}

/** Typed row for type-safe consumers at the API boundary. */
case class CryptoPrice(crypto_id: String, price_usd: Double, extracted_at: Timestamp)
