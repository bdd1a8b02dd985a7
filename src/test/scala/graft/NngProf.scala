package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the neighbor-graph serving loop (not CI). */
object NngProf {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import spark.implicits._
    (1 to 3).foreach { it =>
      System.err.println(s"[prof] === iteration $it ===")
      val idx = t("stage.derived") {
        graft.Stage.derived("nng_6x5_m12_b16_v", d) { p =>
          graft.sources.NeighborGraph.build(Tables.embeddings(spark, d),
            p.toString, m = 12, numTables = 6, planesPerTable = 5, nBuckets = 16)
        }
      }
      val emb = Tables.embeddings(spark, d)
      val queries = emb.filter($"vec_id" < 8)
      val res = t("beamSearch total") {
        graft.sources.NeighborGraph.beamSearch(spark, idx.toString, queries,
          emb, k = 5, beamWidth = 16, rounds = 5, nBuckets = 16, nEntries = 8)
      }
      t("orderBy+collect")(res.orderBy($"query_id", $"rank").collect().length)
    }
    spark.stop()
  }
}
