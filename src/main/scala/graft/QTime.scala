package graft
import graft.CacheLifecycle.TrackedPersistOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev utility: time queries (args = names) or dump plans (-plan name). */
object QTime {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    if (args.headOption.contains("-q45stages")) {
      val docs = Tables.documents(spark, d)
      // the OPERATOR's shingle pipeline, not a copy — staged timings must
      // measure what q45 actually runs
      val shingleRows = operators.Dedup.shingleHashRows(docs, "doc_id", "text", 3)
      time("shingleRows count")(println("n=" + shingleRows.count()))
      val sigCols = (0 until 64).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
      val sigsOnly = shingleRows.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      time("sigs-only (codegen)")(sigsOnly.count())
      val setOnly = shingleRows.groupBy("doc_id").agg(collect_set(col("h")).as("sh"))
      time("collect_set-only")(setOnly.count())
      val combined = shingleRows.groupBy("doc_id")
        .agg(collect_set(col("h")).as("sh"), sigCols: _*)
      time("combined agg")(combined.count())
      val full = operators.Dedup.nearDuplicatePairs(docs, "doc_id", "text", 3, 0.6)
      time("full q45")(full.count())
    } else if (args.headOption.contains("-q56stages")) {
      val emb = Tables.embeddings(spark, d)
      val pairs = operators.Similarity.lshSimilarPairs(emb, 0.4,
        numTables = 6, planesPerTable = 5)
      time("lsh pairs")(println("pairs=" + pairs.count()))
      val pairs2 = operators.Similarity.lshSimilarPairs(emb, 0.4,
          numTables = 6, planesPerTable = 5)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")).persistTracked()
      time("lsh pairs persisted")(println("pairs=" + pairs2.count()))
      time("clusterPairs on persisted")(
        println("rows=" + operators.Dedup.clusterPairs(pairs2).count()))
      val full = queries.Vectors.q56(spark, d)
      time("full q56")(println("rows=" + full.count()))
    } else if (args.headOption.contains("-q49stages")) {
      val li = Tables.lineitem(spark, d)
      time("scan+groupBy(v) count")(
        println("groups=" + li.groupBy(col("l_extendedprice")).count().count()))
      val byVal = li.groupBy(col("l_extendedprice").as("v"))
        .agg(count(lit(1)).as("c")).persistTracked()
      time("byVal persist")(println("n=" + byVal.count()))
      val bounds = byVal.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      time("bounds")(bounds.collect())
      val sliced = byVal.crossJoin(broadcast(bounds))
        .withColumn("slice",
          least(floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / 64)),
            lit(63)).cast("int"))
      time("sliced count")(sliced.count())
      val wLocal = org.apache.spark.sql.expressions.Window
        .partitionBy(col("slice")).orderBy(col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      time("local window")(sliced.withColumn("lc", sum(col("c")).over(wLocal)).count())
      time("full q49")(queries.Extended.q49(spark, d).count())
      time("full q49 again")(queries.Extended.q49(spark, d).count())
    } else if (args.headOption.contains("-q231dbg")) {
      // same builder as q231 — the shared persistent artifact cannot
      // diverge between the query and this probe
      val staged = queries.Events.lateSplitStage(spark, d)
      println("files: " + java.nio.file.Files.list(staged).toArray.toSeq)
      val stream = graft.streaming.Streams.eventsStream(spark, staged.toString,
        glob = "*.parquet", maxFilesPerTrigger = Some(1))
      val hourly = stream
        .withWatermark("ts_us", "2 hours")
        .groupBy(window(col("ts_us"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val (res, progress) = graft.streaming.Streams.runToMemoryTracked(
        spark, hourly, "dbg_sink",
        org.apache.spark.sql.streaming.OutputMode.Append())
      progress.foreach { pr =>
        println(s"batch=${pr.batchId} rows=${pr.numInputRows} " +
          s"wm=${pr.eventTime.get("watermark")} " +
          pr.stateOperators.map(so =>
            s"dropped=${so.numRowsDroppedByWatermark} total=${so.numRowsTotal}")
            .mkString(","))
      }
      println("result rows=" + res.count())
      println("result sum=" + res.agg(sum(col("n_events"))).head.getLong(0))
      val ev = Tables.events(spark, d)
      val maxOldNs = ev.filter(col("event_id") % 2 === 0 &&
          expr("ts div 1000000000 div 86400") < 19743)
        .agg(max(col("ts"))).head.getLong(0)
      val maxNs = ev.agg(max(col("ts"))).head.getLong(0)
      val w1 = maxOldNs / 1000000L - 7200000L // wm during the odd batch
      val w2 = maxNs / 1000000L - 7200000L    // final wm
      val hours = ev.select(
        (expr("ts div 1000000000 div 3600") * 3600000L).as("hstartMs"),
        (col("event_id") % 2).as("par"))
      val closed = hours.filter(col("hstartMs") + 3600000L <= w2)
      println("evens-only-closed=" + closed.filter(col("par") === 0).count())
      println("merged-closed=" + closed.count())
      println("drop-model=" + closed.filter(col("par") === 0 ||
        col("hstartMs") + 3600000L > w1).count())
    } else if (args.headOption.contains("-q58prof")) {
      // profile the streaming floor: per-batch durations of the q58 drain
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val joined = streaming.Streams.viewPurchaseIntervalJoin(spark, d)
        val t1 = System.nanoTime()
        val (_, prog) = streaming.Streams.runToMemoryTracked(spark, joined,
          "q58prof_sink", org.apache.spark.sql.streaming.OutputMode.Append())
        val t2 = System.nanoTime()
        println(f"RUN$i plan=${(t1 - t0) / 1e9}%.2f drain=${(t2 - t1) / 1e9}%.2f")
        prog.foreach { p =>
          println(s"  batch ${p.batchId}: total=${p.batchDuration}ms " +
            s"durations=${p.durationMs}")
        }
      }
    } else if (args.headOption.contains("-plan")) {
      args.drop(1).foreach { name =>
        println(s"===== $name =====")
        println(SparkEntry.queries(name)(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    } else if (args.headOption.contains("-planexec")) {
      // POST-execution adaptive plan: AQE decisions (stage reuse, coalesce,
      // broadcast demotion) only exist after the query runs.
      args.drop(1).foreach { name =>
        val df = SparkEntry.queries(name)(spark, d)
        df.count()
        println(s"===== $name (executed) =====")
        println(df.queryExecution.executedPlan.toString)
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
