package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev utility: time queries (args = names) or dump plans (-plan name). */
object QTime {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    if (args.headOption.contains("-q45stages")) {
      import graft.functions.TextFunctions._
      val docs = Tables.documents(spark, d)
      val base = docs.select(col("doc_id"), wordShingles(tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0).persist()
      time("base count")(base.count())
      val hashed = base.select(col("doc_id"), explode(col("sh")).as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("h"))
      time("hashed count")(hashed.count())
      val sigCols = (0 until 64).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
      val sigs = hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      time("sigs count")(sigs.count())
      val bandCols = (0 until 32).map { b =>
        val slice = (0 until 2).map(r => col(s"m${b * 2 + r}"))
        struct(lit(b).as("band"), xxhash64(lit(b) +: slice: _*).as("bh"))
      }
      val banded = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh")).persist()
      time("banded count")(banded.count())
      val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
      time("candidates")(println("n_cand=" + cand.count()))
      val full = operators.Dedup.nearDuplicatePairs(docs, "doc_id", "text", 3, 0.6)
      time("full q45")(full.count())
    } else if (args.headOption.contains("-plan")) {
      args.drop(1).foreach { name =>
        println(s"===== $name =====")
        println(SparkEntry.queries(name)(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    } else {
      spark.range(100000).count()
      for (name <- args) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, d).count()
        println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
