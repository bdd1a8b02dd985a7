package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch profiler for the neighbor-graph serving loop (not CI — run
  * with `sbt "Test/runMain graft.NngProf [--recall]"`; numbers recorded
  * in PLANS.md). Default mode times a repeated standard probe (serving
  * steady state); `--recall` measures recall@5 vs brute force for the
  * flat, refined, and hierarchical builds at the standard budget, plus
  * the q356 budget ladder. Set GRAFT_NNG_PROF=1 for per-phase timers
  * and visited-set sizes. */
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
    if (args.contains("--recall")) {
      val emb = Tables.embeddings(spark, d)
      val queries = emb.filter($"vec_id" < 8)
      val bf = Similarity.bruteForceTopK(queries, emb, k = 5, queryCountHint = 8)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallOf(found: Set[(Long, Long)]): Double =
        (bf intersect found).size.toDouble / bf.size
      for (rr <- Seq(0, 1)) {
        val p = TempDirs.fresh(s"graft_nngflat$rr")
        graft.sources.NeighborGraph.build(emb, p.toString, m = 12,
          numTables = 6, planesPerTable = 5, nBuckets = 16, refineRounds = rr)
        for ((bw, ro) <- Seq((16, 5), (32, 6), (64, 8))) {
          val ng = graft.sources.NeighborGraph.beamSearch(spark, p.toString,
              queries, emb, k = 5, beamWidth = bw, rounds = ro, nBuckets = 16,
              nEntries = 8)
            .select($"query_id", $"neighbor_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          System.err.println(
            f"[prof] FLAT refine=$rr beam=$bw rounds=$ro recall@5 = ${recallOf(ng)}%.3f")
        }
      }
      val ph = TempDirs.fresh("graft_nnghierprof")
      graft.sources.NeighborGraph.buildHier(emb, ph.toString, m = 12,
        numTables = 6, planesPerTable = 5, nBuckets = 16, refineRounds = 1,
        l1Mod = 8)
      val hg = graft.sources.NeighborGraph.beamSearchHier(spark, ph.toString,
          queries, emb, k = 5, l1Beam = 8, l1Rounds = 3, beamWidth = 16,
          rounds = 5, nBuckets = 16, nEntries = 8)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      System.err.println(f"[prof] HIER refine=1 recall@5 = ${recallOf(hg)}%.3f")
      spark.stop()
      return
    }
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
