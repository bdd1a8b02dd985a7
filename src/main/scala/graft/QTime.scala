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
    } else if (args.headOption.contains("-q224stages")) {
      import graft.CacheLifecycle.TrackedPersistOps
      val opq = Tables.lineitem(spark, d)
        .groupBy(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      val comp = opq.as("a").join(opq.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p") &&
            col("a.q") =!= col("b.q"))
        .select(col("a.p").as("pa"), col("b.p").as("pb"),
          when(col("a.q") > col("b.q"), 1L).otherwise(0L).as("a_wins"))
      time("comp count")(println(comp.count()))
      val pairAgg = comp.groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("n"), sum(col("a_wins")).as("wa"))
      time("pairAgg count")(println(pairAgg.count()))
      val sym = pairAgg.select(col("pa").as("i"), col("pb").as("j"),
          col("n"), col("wa").as("w"))
        .unionByName(pairAgg.select(col("pb").as("i"), col("pa").as("j"),
          col("n"), (col("n") - col("wa")).as("w")))
        .select(col("i"), col("j"), (lit(2) * col("n") + 2).as("n2"),
          (lit(2) * col("w") + 1).as("w2"), col("n"), col("w"))
        .persistTracked()
      time("sym materialize")(println(sym.count()))
      val items = sym.groupBy(col("i"))
        .agg(sum(col("w2")).as("w2t"), sum(col("n")).as("n_games"),
          sum(col("w")).as("n_wins")).persistTracked()
      time("items materialize")(println(items.count()))
      def iter(g: org.apache.spark.sql.DataFrame) = {
        val e = sym
          .join(g.select(col("i"), col("g").as("gi")), "i")
          .join(g.select(col("i").as("j"), col("g").as("gj")), "j")
          .withColumn("e", round(col("n2").cast("double") * 1e18 /
            (col("gi") + col("gj")).cast("double")).cast("long"))
          .groupBy(col("i")).agg(sum(col("e")).as("dsum"))
        items.join(e, "i")
          .select(col("i"), round(col("w2t").cast("double") * 1e18 /
            col("dsum").cast("double")).cast("long").as("g")).persistTracked()
      }
      val g0 = items.select(col("i"), lit(1000000000L).as("g"))
      val g1 = time("round 1")(iter(g0))
      time("round 1 materialize")(println(g1.count()))
      val g2 = time("round 2")(iter(g1))
      time("round 2 materialize")(println(g2.count()))
      time("final")(println(items.join(g2, "i").count()))
    } else if (args.headOption.contains("-q231dbg")) {
      val staged = graft.Stage.derived("events_late_split3", d) { p =>
        def writeOne(df: org.apache.spark.sql.DataFrame, name: String,
            mtimeMs: Long): Unit = {
          val tmp = p.resolve(s"tmp_$name")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
            .filter(_.endsWith(".parquet")).head
          val dest = p.resolve(name)
          java.nio.file.Files.move(java.nio.file.Paths.get(part), dest)
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        }
        val raw = spark.read.parquet(s"$d/events.parquet")
          .withColumn("day", expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        val t0 = System.currentTimeMillis() - 300000
        writeOne(raw.filter(col("event_id") % 2 === 0 && col("day") < 19743)
          .drop("day"), "f1_even_old.parquet", t0)
        writeOne(raw.filter(col("event_id") % 2 === 0 && col("day") >= 19743)
          .drop("day"), "f2_even_new.parquet", t0 + 60000)
        writeOne(raw.filter(col("event_id") % 2 === 1).drop("day"),
          "f3_odd.parquet", t0 + 120000)
      }
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
