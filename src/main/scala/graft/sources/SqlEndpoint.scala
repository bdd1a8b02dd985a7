package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** Network SQL entry point — the reference's third entry path is a BI tool
  * (Metabase) issuing SQL over a warehouse connection
  * (/root/reference/README.md:98-106). The Spark-native counterpart is the
  * HiveServer2-protocol endpoint: any JDBC/ODBC BI client connects with
  * `jdbc:hive2://host:port` and its SQL runs through the same Catalyst
  * session that serves the programmatic API.
  *
  * Tables are exposed as GLOBAL temp views (`global_temp.<name>`) so every
  * JDBC connection (each gets its own Spark session) sees them without a
  * shared metastore. On a cluster this is the standard multi-tenant SQL
  * gateway shape: one long-lived driver owns the endpoint, executors fan
  * out per query exactly as for native jobs.
  */
object SqlEndpoint {

  /** Start a HiveServer2-protocol endpoint on `port`, serving `spark`'s
    * catalog. Returns the server handle (its concrete Spark class is
    * private[hive]; the public Hive base type carries `stop()`). */
  def start(spark: SparkSession, port: Int): org.apache.hive.service.server.HiveServer2 = {
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    HiveThriftServer2.startWithContext(spark.sqlContext)
  }

  /** Register every testdata table as a global temp view, queryable from
    * any endpoint connection as `global_temp.<name>`. */
  def exposeTables(spark: SparkSession, sfDir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.Tables.names.foreach { n =>
      graft.Tables.load(spark, sfDir, n).createOrReplaceGlobalTempView(n)
    }
  }
}
