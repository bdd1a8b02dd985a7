package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.{Ingest, QualityGate, Upsert}

/** Oracle-checked queries exercising the Tier-A pipeline operators
  * (SURVEY.md §2.A): the JSON pivot, the idempotent upsert, and the
  * quality gate. The crypto fixture payload is the exact CoinGecko shape
  * the reference parses (FIXTURES.md §1.1); its oracle is a VALUES list.
  */
object PipelineQueries {
  import Q._

  /** FIXTURES.md §1.1 payload — one extra currency to prove projection
    * keeps only usd, values chosen exactly representable in 2 decimals. */
  val fixtureJson: String =
    """{"bitcoin": {"usd": 67210.0}, "ethereum": {"usd": 3245.12, "eur": 3001.9},
      | "tether": {"usd": 0.99}, "solana": {"usd": 152.33}}""".stripMargin
  /** 2024-01-15 12:00:00 UTC. Built from the explicit epoch —
    * Timestamp.valueOf would parse in the JVM default timezone and diverge
    * from the UTC-pinned session (and the oracle's literal) on non-UTC
    * hosts. */
  val fixtureTs: Timestamp = new Timestamp(1705320000L * 1000)

  // --- q31: pivot + stamp + double-apply upsert (idempotency) -------------
  // The full transform/load math of the reference on its own payload shape:
  // map→rows explode (A4), projection (A5), batch timestamp (A6), and the
  // ON-CONFLICT-DO-NOTHING equivalence (A8): applying the same batch twice
  // leaves exactly one row per key.
  def q31(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val batch = Ingest.pivotPrices(s, fixtureJson, fixtureTs)
    val empty = batch.limit(0)
    val once = Upsert(empty, batch, Seq("crypto_id", "extracted_at"))
    val twice = Upsert(once, batch, Seq("crypto_id", "extracted_at"))
    twice.select($"crypto_id", $"price_usd",
      date_format($"extracted_at", "yyyy-MM-dd HH:mm:ss").as("extracted_at"))
      .orderBy($"crypto_id")
  }
  val q31Sql: String =
    """SELECT crypto_id, CAST(price_usd AS DOUBLE) AS price_usd, extracted_at
      |FROM (VALUES
      |  ('bitcoin', 67210.0, '2024-01-15 12:00:00'),
      |  ('ethereum', 3245.12, '2024-01-15 12:00:00'),
      |  ('solana', 152.33, '2024-01-15 12:00:00'),
      |  ('tether', 0.99, '2024-01-15 12:00:00'))
      |  AS t(crypto_id, price_usd, extracted_at)
      |ORDER BY crypto_id""".stripMargin

  // --- q32: upsert against real data — anti-join set algebra --------------
  // existing = events with id%3=0, incoming = id%2=0; the upserted table
  // must equal the set {id%3=0 ∪ id%2=0}, which the oracle states directly.
  def q32(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"event_id", $"event_type", $"value")
    val existing = ev.filter($"event_id" % 3 === 0)
    val incoming = ev.filter($"event_id" % 2 === 0)
    Upsert(existing, incoming, Seq("event_id"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), dsum($"value").as("sum_value"))
      .orderBy($"event_type")
  }
  val q32Sql: String =
    """SELECT event_type, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE event_id % 3 = 0 OR event_id % 2 = 0
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --- q33: quality-gate metrics (A9 min-domain + A10 freshness) ----------
  // One aggregation pass computes every gate metric; `now` is pinned so the
  // staleness ladder is reproducible. Events end 2024-01-30 23:26; with
  // now = 2024-02-01 00:00 the table is ~24h stale → status 'fail' (>6h),
  // exercising the severity ladder's top rung.
  /** 2024-02-01 00:00:00 UTC — same epoch the oracle hardcodes (1706745600);
    * explicit-epoch construction keeps it JVM-timezone-independent. */
  val gateNow: Timestamp = new Timestamp(1706745600L * 1000)
  def q33(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .withColumn("epoch_s", expr("ts div 1000000000"))
    QualityGate.metricsDf(ev, gateNow, $"value", $"epoch_s")
  }
  val q33Sql: String =
    """SELECT min_value, n_rows, max_ts,
      |  CAST(FLOOR((1706745600 - max_epoch_s) / 3600.0) AS BIGINT) AS hours_stale,
      |  CASE WHEN min_value < 0
      |         OR CAST(FLOOR((1706745600 - max_epoch_s) / 3600.0) AS BIGINT) > 6 THEN 'fail'
      |       WHEN CAST(FLOOR((1706745600 - max_epoch_s) / 3600.0) AS BIGINT) > 2 THEN 'warn'
      |       ELSE 'pass' END AS status
      |FROM (
      |  SELECT MIN(value) AS min_value, COUNT(*) AS n_rows,
      |    strftime(date_trunc('second', MAX(ts)), '%Y-%m-%d %H:%M:%S') AS max_ts,
      |    MAX(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS max_epoch_s
      |  FROM events)""".stripMargin

  // --- q118: Postgres REAL strict-compat projection -----------------------
  // The reference's warehouse column is float4; the engine standardizes on
  // DoubleType with the divergence documented (SURVEY.md §1.2). The compat
  // projection (Ingest.float4Compat) narrows through FloatType — the same
  // precision loss Postgres applies on INSERT — and this query proves the
  // narrowed values cross-engine: float→double widening is exact IEEE, so
  // Spark's cast(cast(x as float) as double) must hash-match DuckDB's
  // CAST(CAST(x AS REAL) AS DOUBLE) bit for bit. f4_error surfaces the
  // actual precision the compat mode gives up per coin.
  def q118(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val batch = Ingest.pivotPrices(s, fixtureJson, fixtureTs)
    Ingest.float4Compat(batch)
      .select($"crypto_id",
        $"price_usd".cast("double").as("price_usd_f4"))
      .join(batch.select($"crypto_id", $"price_usd"), "crypto_id")
      .select($"crypto_id", $"price_usd", $"price_usd_f4",
        ($"price_usd_f4" - $"price_usd").as("f4_error"))
      .orderBy($"crypto_id")
  }
  val q118Sql: String =
    """SELECT crypto_id, price_usd,
      |  CAST(CAST(price_usd AS REAL) AS DOUBLE) AS price_usd_f4,
      |  CAST(CAST(price_usd AS REAL) AS DOUBLE) - price_usd AS f4_error
      |FROM (VALUES
      |  ('bitcoin', CAST(67210.0 AS DOUBLE)),
      |  ('ethereum', CAST(3245.12 AS DOUBLE)),
      |  ('solana', CAST(152.33 AS DOUBLE)),
      |  ('tether', CAST(0.99 AS DOUBLE)))
      |  AS t(crypto_id, price_usd)
      |ORDER BY crypto_id""".stripMargin

  // --- q340: malformed-input quarantine (PERMISSIVE parse, per-source) ----
  // The daily first-operator of any scraped-data pipeline, and the
  // generalization of the reference's fail-fast json.loads
  // (dags/crypto-etl-pipeline-psql.py:45-46,177): parse a batch of JSON
  // payloads where a deterministic fraction is corrupt, quarantine the
  // malformed rows WITH their raw payload, and report per-source
  // parsed/quarantined counts + a gate severity — the batch survives,
  // the evidence is retained, the gate still fires. Fixture: one payload
  // per events row built from exact integers (doubles never enter the
  // string, so both engines render identical text); rows where a
  // portable md5 draw falls under 3·len(event_type)% get their payload
  // TRUNCATED mid-object — structurally invalid JSON to any parser, so
  // Spark's PERMISSIVE _corrupt_record classification and DuckDB's
  // json_valid agree by construction, not by parser-quirk luck. Each
  // source's corruption rate differs (12–24%), so the ppm thresholds
  // exercise all three gate severities in one result. sum_parsed_user
  // proves the clean rows actually project through the typed schema
  // (nulls from quarantined rows are skipped by SUM in both engines).
  // Scale shape: the parse is one codegen'd projection, the rollup one
  // source-keyed partial+final agg — no driver loop, no second pass.
  def q340(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val h = conv(substring(md5(coalesce($"event_id", lit(-1L)).cast("string")),
      1, 14), 16, 10).cast("long") % 100
    val eid = coalesce($"event_id", lit(-1L)).cast("string")
    val uid = coalesce($"user_id", lit(-1L)).cast("string")
    val payload = when(h < length($"event_type") * 3,
        concat(lit("{\"event_id\":"), eid, lit(",\"user_id\":")))
      .otherwise(concat(lit("{\"event_id\":"), eid,
        lit(",\"user_id\":"), uid, lit("}")))
    val raw = Tables.events(s, d)
      .select($"event_type", payload.as("body"))
    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType)
    val parsed = graft.etl.Quarantine.parseJson(raw, "body", schema)
    graft.etl.Quarantine.stats(parsed, "event_type",
        warnPpm = 130000L, failPpm = 200000L,
        extraAggs = Seq(sum($"parsed.user_id").as("sum_parsed_user")))
      .orderBy($"source")
  }
  val q340Sql: String =
    """WITH raw AS (
      |  SELECT event_type AS source,
      |    CASE WHEN ('0x' || substr(md5(CAST(COALESCE(event_id, -1) AS VARCHAR)), 1, 14))::BIGINT % 100
      |           < length(event_type) * 3
      |      THEN '{"event_id":' || CAST(COALESCE(event_id, -1) AS VARCHAR) || ',"user_id":'
      |      ELSE '{"event_id":' || CAST(COALESCE(event_id, -1) AS VARCHAR)
      |           || ',"user_id":' || CAST(COALESCE(user_id, -1) AS VARCHAR) || '}'
      |    END AS body
      |  FROM events),
      |cls AS (
      |  SELECT source, json_valid(body) AS ok,
      |    CASE WHEN json_valid(body)
      |      THEN CAST(body->>'user_id' AS BIGINT) END AS parsed_user
      |  FROM raw),
      |agg AS (
      |  SELECT source,
      |    CAST(COUNT(*) AS BIGINT) AS n_total,
      |    CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
      |    CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_quarantined,
      |    CAST(SUM(parsed_user) AS BIGINT) AS sum_parsed_user
      |  FROM cls GROUP BY source)
      |SELECT source, n_total, n_parsed, n_quarantined, sum_parsed_user,
      |  CAST(CAST(n_quarantined AS HUGEINT) * 1000000 // n_total AS BIGINT)
      |    AS quarantine_ppm,
      |  CASE
      |    WHEN CAST(n_quarantined AS HUGEINT) * 1000000 // n_total >= 200000 THEN 'fail'
      |    WHEN CAST(n_quarantined AS HUGEINT) * 1000000 // n_total >= 130000 THEN 'warn'
      |    ELSE 'ok' END AS gate_status
      |FROM agg
      |ORDER BY source""".stripMargin

  // --- q349: CSV quarantine (the delimited twin of q340) --------------------
  // The same PERMISSIVE-parse contract over the other ubiquitous wire
  // format: one CSV line per events row, a deterministic per-source
  // fraction type-corrupted (a non-numeric token where the schema says
  // BIGINT), parsed by Quarantine.parseCsv — the malformed line rides
  // _corrupt_record verbatim, clean lines project through the typed
  // schema. The oracle classifies independently with ITS own parse
  // (TRY_CAST of the split token — per-field permissive semantics, not
  // a restatement of our hash rule), so the gate proves from_csv's
  // classification against a second parser, the q340 discipline.
  def q349(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val h = conv(substring(md5(concat(lit("csv|"),
      coalesce($"event_id", lit(-1L)).cast("string"))), 1, 14), 16, 10)
      .cast("long") % 100
    val eid = coalesce($"event_id", lit(-1L)).cast("string")
    val uid = coalesce($"user_id", lit(-1L)).cast("string")
    val line = when(h < length($"event_type") * 2,
        concat(eid, lit(","), lit("x"), uid))
      .otherwise(concat(eid, lit(","), uid))
    val raw = Tables.events(s, d)
      .select($"event_type", line.as("body"))
    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType)
    val parsed = graft.etl.Quarantine.parseCsv(raw, "body", schema)
    graft.etl.Quarantine.stats(parsed, "event_type",
        warnPpm = 90000L, failPpm = 140000L,
        extraAggs = Seq(sum($"parsed.user_id").as("sum_parsed_user")))
      .orderBy($"source")
  }
  val q349Sql: String =
    """WITH raw AS (
      |  SELECT event_type AS source,
      |    CAST(COALESCE(event_id, -1) AS VARCHAR) || ',' ||
      |    CASE WHEN ('0x' || substr(md5('csv|' || CAST(COALESCE(event_id, -1) AS VARCHAR)), 1, 14))::BIGINT % 100
      |           < length(event_type) * 2
      |      THEN 'x' ELSE '' END ||
      |    CAST(COALESCE(user_id, -1) AS VARCHAR) AS body
      |  FROM events),
      |cls AS (
      |  SELECT source,
      |    TRY_CAST(split_part(body, ',', 2) AS BIGINT) AS parsed_user
      |  FROM raw),
      |agg AS (
      |  SELECT source,
      |    CAST(COUNT(*) AS BIGINT) AS n_total,
      |    CAST(SUM(CASE WHEN parsed_user IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
      |    CAST(SUM(CASE WHEN parsed_user IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
      |    CAST(SUM(parsed_user) AS BIGINT) AS sum_parsed_user
      |  FROM cls GROUP BY source)
      |SELECT source, n_total, n_parsed, n_quarantined, sum_parsed_user,
      |  CAST(CAST(n_quarantined AS HUGEINT) * 1000000 // n_total AS BIGINT)
      |    AS quarantine_ppm,
      |  CASE
      |    WHEN CAST(n_quarantined AS HUGEINT) * 1000000 // n_total >= 140000 THEN 'fail'
      |    WHEN CAST(n_quarantined AS HUGEINT) * 1000000 // n_total >= 90000 THEN 'warn'
      |    ELSE 'ok' END AS gate_status
      |FROM agg
      |ORDER BY source""".stripMargin

  // --- q352: streaming quarantine (q340 THROUGH the streaming engine) ------
  // The quarantine contract where it actually runs in production: on the
  // ingest stream. The same deterministically-corrupted payloads arrive
  // as a file stream; each micro-batch is PERMISSIVE-parsed and its
  // per-source outcome PARTIALS land in an append sink (counts and sums
  // — a monoid, so batch boundaries can't change the rollup); the final
  // read merges partials and applies the same ppm thresholds. Output ≡
  // q340's by construction, so the oracle IS q340's SQL — the q197/q327
  // streaming-twin discipline: a batch boundary that lost or duplicated
  // a row hash-misses.
  def q352(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val base = graft.TempDirs.fresh("graft_quarstream")
    val stream = graft.streaming.Streams.eventsStream(s, d)
    val h = conv(substring(md5(coalesce($"event_id", lit(-1L)).cast("string")),
      1, 14), 16, 10).cast("long") % 100
    val eid = coalesce($"event_id", lit(-1L)).cast("string")
    val uid = coalesce($"user_id", lit(-1L)).cast("string")
    val payload = when(h < length($"event_type") * 3,
        concat(lit("{\"event_id\":"), eid, lit(",\"user_id\":")))
      .otherwise(concat(lit("{\"event_id\":"), eid,
        lit(",\"user_id\":"), uid, lit("}")))
    val raw = stream.select($"event_type", payload.as("body"))
    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType)
    graft.streaming.Streams.drainToParquet(raw,
        s"$base/sink", s"$base/ckpt") { (batch, _) =>
      val parsed = graft.etl.Quarantine.parseJson(batch, "body", schema)
      val q = graft.etl.Quarantine.isQuarantined("parsed")
      parsed.groupBy($"event_type".as("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(q, 0L).otherwise(1L)).as("n_parsed"),
          sum(when(q, 1L).otherwise(0L)).as("n_quarantined"),
          sum($"parsed.user_id").as("sum_parsed_user"))
    }
    s.read.parquet(s"$base/sink")
      .groupBy($"source")
      .agg(sum($"n_total").as("n_total"), sum($"n_parsed").as("n_parsed"),
        sum($"n_quarantined").as("n_quarantined"),
        sum($"sum_parsed_user").as("sum_parsed_user"))
      .withColumn("quarantine_ppm", expr(
        "cast(cast(n_quarantined as decimal(38,0)) * 1000000 div n_total as bigint)"))
      .withColumn("gate_status",
        when(col("quarantine_ppm") >= 200000L, lit("fail"))
          .when(col("quarantine_ppm") >= 130000L, lit("warn"))
          .otherwise(lit("ok")))
      .orderBy($"source")
  }
  val q352Sql: String = q340Sql

  def pack: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q31_crypto_pipeline", q31 _, Some(q31Sql)),
    ("q32_upsert_idempotent", q32 _, Some(q32Sql)),
    ("q33_quality_gate", q33 _, Some(q33Sql)),
    ("q118_float_compat", q118 _, Some(q118Sql)),
    ("q340_quarantine_parse", q340 _, Some(q340Sql)),
    ("q349_quarantine_csv", q349 _, Some(q349Sql)),
    ("q352_quarantine_stream", q352 _, Some(q352Sql)))
}
