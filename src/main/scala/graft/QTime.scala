package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: time queries (args = names) or dump plans (-plan name). */
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.headOption.contains("-plan")) {
      args.drop(1).foreach { name =>
        println(s"===== $name =====")
        println(SparkEntry.queries(name)(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    } else {
      spark.range(100000).count()
      val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
      for (name <- names) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, d).count()
        println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
