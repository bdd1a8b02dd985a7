package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 "http-json" batch source — the scale-minded form of the
  * reference's HTTP extract (A2, /root/reference/dags/crypto-etl-pipeline-psql.py:168-179).
  *
  * One input partition per URL: each executor fetches its shard of
  * endpoints in parallel, so ingest bandwidth scales with the cluster
  * instead of the driver (the driver-side [[graft.etl.Http]] path stays
  * the right choice for the reference's one-tiny-payload-per-run shape).
  *
  * The source lands the RAW payload in a fixed landing-zone schema
  * (url, status, body) on purpose: parsing stays declarative downstream
  * (`from_json` + explode in [[graft.etl.Ingest.pivotPrices]]), where the
  * schema is explicit and Catalyst can prune/push down — the same
  * raw-then-parse split the landing-zone file path uses. A failed fetch
  * becomes a row with status 0 and null body rather than a task failure:
  * per-endpoint errors are data (filterable, retryable by re-reading the
  * failed subset), not job aborts.
  *
  * Usage: `spark.read.format("http-json").option("urls", "u1,u2,...").load()`
  * (registered via DataSourceRegister; option `timeoutSeconds` bounds each
  * fetch like the reference's 60s sensor budget).
  */
class HttpJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "http-json"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpJsonSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // getTable receives the ORIGINAL-cased keys (asCaseSensitiveMap), so
    // re-wrap for the case-insensitive lookups options promise
    val opts = new CaseInsensitiveStringMap(properties)
    val urls = Option(opts.get("urls")).getOrElse(
      throw new IllegalArgumentException("http-json source requires an 'urls' option"))
    val timeout = Option(opts.get("timeoutSeconds")).map(_.toLong).getOrElse(30L)
    new HttpJsonTable(urls.split(",").map(_.trim).filter(_.nonEmpty), timeout)
  }
}

object HttpJsonSource {
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("body", StringType, nullable = true)))
}

private[sources] class HttpJsonTable(urls: Array[String], timeout: Long)
    extends Table with SupportsRead {
  override def name(): String = s"http-json(${urls.length} urls)"
  override def schema(): StructType = HttpJsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = HttpJsonSource.schema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            urls.map(u => HttpUrlPartition(u): InputPartition)
          override def createReaderFactory(): PartitionReaderFactory =
            new HttpPartitionReaderFactory(timeout)
        }
      }
    }
}

private[sources] final case class HttpUrlPartition(url: String) extends InputPartition

private[sources] class HttpPartitionReaderFactory(timeout: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val url = p.asInstanceOf[HttpUrlPartition].url
      private var done = false
      private var row: InternalRow = _
      override def next(): Boolean =
        if (done) false
        else {
          // Only non-fatal fetch failures become data; interrupts (task
          // kill/speculation) and fatal errors must still fail the task —
          // folding them into a status-0 row would commit a fabricated
          // result for a URL that another attempt fetches fine.
          // (NonFatal classifies InterruptedException as fatal, so
          // interrupts propagate and fail the task as they should)
          val (status, body) =
            try graft.etl.Http.get(url, timeout)
            catch { case scala.util.control.NonFatal(_) => (0, null) }
          row = InternalRow(UTF8String.fromString(url), status,
            if (body == null) null else UTF8String.fromString(body))
          done = true
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}
