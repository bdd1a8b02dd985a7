package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All engine queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) and read
  * the parquet files directly — filters and column pruning push down to the
  * scan, so at 100 TB scale only the referenced columns/row-groups are read.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** Engine-internal canonical form of `events.ts`: a raw long of epoch
    * NANOSECONDS, whatever the file's physical type. Current testdata
    * writes parquet timestamp[us] (µs→ns is exact in int64: 2^63 ns ≈ 292
    * years); earlier generations wrote TIMESTAMP(NANOS), which Spark can
    * only surface as a long. Downstream queries derive epoch seconds /
    * microsecond timestamps via integer `div` — never through a double,
    * which cannot hold ns magnitudes exactly.
    *
    * The normalization is SCHEMA-DRIVEN, not conf-driven: round 6 proved
    * that steering this through a global legacy flag
    * (spark.sql.legacy.parquet.nanosAsLong) silently no-ops when the file
    * type changes under it. No session conf is mutated here. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        // withColumn replaces in place, preserving column order
        df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet TIMESTAMP(us, isAdjustedToUTC=false) — the current
        // testdata shape. The NTZ wall-clock is epoch-anchored via a cast,
        // exact because every engine session pins session tz = UTC (the
        // same interpretation DuckDB's naive-timestamp epoch() uses).
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
      case org.apache.spark.sql.types.LongType => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected timestamp or long)")
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(loadEventsRaw(s, d))

  /** Raw read of events.parquet. If the file is legacy TIMESTAMP(NANOS),
    * the plain read fails schema conversion with the PARQUET_TYPE_ILLEGAL
    * error condition naming a NANOS type; retry with the nanosAsLong flag
    * (which then yields the long form directly). The match is on the
    * typed error condition — not a free-text message sniff, which could
    * both false-positive on unrelated errors mentioning "nanos" and
    * false-negative if the wording changes. The flag is set on a CLONED
    * session so the caller's session conf is never mutated; the returned
    * DataFrame executes under the clone, where the flag must stay set for
    * the scan itself (it no-ops for non-NANOS files, so downstream plan
    * reuse of the clone is safe). */
  private def loadEventsRaw(s: SparkSession, d: String): DataFrame =
    try load(s, d, "events")
    catch { case e: org.apache.spark.sql.AnalysisException
        if e.getCondition == "PARQUET_TYPE_ILLEGAL" &&
          e.getMessage.contains("NANOS") =>
      val legacy = s.newSession()
      legacy.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      load(legacy, d, "events")
    }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` works over them
    * (the Metabase-style ad-hoc SQL entry point, SURVEY.md §3.3). */
  /** Expected testdata layout (TESTDATA.md). Types as Spark reads them
    * from the driver-generated parquet; `events.ts` is listed in its
    * POST-normalization form (long epoch-ns, see [[normalizeEventsTs]]).
    * Pre-flight compares against this and shouts on drift — the round-6
    * regression (driver regenerated events.ts ns→µs mid-round) shipped
    * silently because nothing checked. */
  private val expectedSchemas: Map[String, String] = Map(
    "region"     -> "r_regionkey:int,r_name:string",
    "nation"     -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer"   -> "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string",
    "supplier"   -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part"       -> "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double",
    "orders"     -> "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string",
    "lineitem"   -> "l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp",
    "events"     -> "event_id:bigint,ts:bigint,user_id:bigint,event_type:string,value:double,props:string",
    "documents"  -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")

  /** Loud schema gate for Verify/Bench: loads every table, renders its
    * (normalized) schema, and compares to [[expectedSchemas]]. Timestamp
    * flavor (TIMESTAMP vs TIMESTAMP_NTZ) is deliberately folded — both
    * read correctly under the UTC-pinned sessions. Returns drift lines;
    * callers decide whether to warn or abort. */
  def preflight(spark: SparkSession, dir: String): Seq[String] = {
    def render(df: DataFrame): String = df.schema.fields.map { f =>
      val t = f.dataType.simpleString.replace("timestamp_ntz", "timestamp")
      s"${f.name}:$t"
    }.mkString(",")
    names.flatMap { n =>
      try {
        val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
        val got = render(df)
        val want = expectedSchemas(n)
        if (got == want) None
        else Some(s"SCHEMA DRIFT in $n: expected [$want] got [$got]")
      } catch {
        case e: Exception => Some(s"SCHEMA DRIFT in $n: load failed: ${e.getMessage}")
      }
    }
  }

  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
