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
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE_BYTES", "16384"))
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
    } else if (args.headOption.contains("-q339dbg")) {
      import graft.CacheLifecycle.TrackedPersistOps
      val pairs = operators.Similarity.lshSimilarPairs(Tables.embeddings(spark, d),
          threshold = 0.3, numTables = 6, planesPerTable = 5,
          eagerSkewProbe = true)
        .persistTracked()
      time("pairs count (build cache)")(println("pairs=" + pairs.count()))
      time("pairs count again")(pairs.count())
      val ts = Seq(0.3, 0.4, 0.5)
      ts.foreach(t => time(s"count >= $t")(
        println(s"  t=$t n=" + pairs.filter(col("sim") >= t).count())))
      val keyed = ts.zipWithIndex.map { case (t, i) =>
        pairs.filter(col("sim") >= t)
          .select((col("vec_a") * 4 + i).as("doc_a"), (col("vec_b") * 4 + i).as("doc_b"))
      }.reduce(_ unionByName _)
      time("keyed count")(println("keyed=" + keyed.count()))
      time("clusterPairs")(
        println("cc rows=" + operators.Dedup.clusterPairs(keyed).count()))
      time("clusterPairs again")(
        println("cc rows=" + operators.Dedup.clusterPairs(keyed).count()))
      time("clusterPairs coalesce32")(println("cc rows=" +
        operators.Dedup.clusterPairs(keyed.coalesce(32)).count()))
      time("clusterPairs coalesce8")(println("cc rows=" +
        operators.Dedup.clusterPairs(keyed.coalesce(8)).count()))
      time("clusterPairs coalesce8 again")(println("cc rows=" +
        operators.Dedup.clusterPairs(keyed.coalesce(8)).count()))
    } else if (args.headOption.contains("-mpb")) {
      // Split-size sensitivity: time each query under
      // files.maxPartitionBytes 128m (default) vs 4m (warm, best of 2).
      spark.range(100000).count()
      args.drop(1).foreach { name =>
        for (mps <- Seq("true", "false")) {
          CacheLifecycle.releaseAll(spark); spark.catalog.clearCache(); System.gc()
          spark.conf.set("spark.sql.codegen.wholeStage", mps)
          SparkEntry.queries(name)(spark, d).count()
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, d).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"MPB $name wholeStageCodegen=$mps best=${times.min}%.3f")
        }
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
      }
    } else if (args.headOption.contains("-conf")) {
      // Config sensitivity: run each query under AQE on/off × shuffle
      // partitions {32, 8} (warm-cache bench semantics, best of 2).
      spark.range(100000).count()
      args.drop(1).foreach { name =>
        for (aqe <- Seq("true", "false"); sp <- Seq("32", "8")) {
          CacheLifecycle.releaseAll(spark); spark.catalog.clearCache(); System.gc()
          spark.conf.set("spark.sql.adaptive.enabled", aqe)
          spark.conf.set("spark.sql.shuffle.partitions", sp)
          SparkEntry.queries(name)(spark, d).count()
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, d).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"CONF $name aqe=$aqe sp=$sp best=${times.min}%.3f")
        }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
    } else if (args.headOption.contains("-phases")) {
      // Query-planning phase breakdown (analysis/optimization/planning ms)
      // for the terminal action's plan, plus wall.
      spark.range(100000).count()
      val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(fn: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val ph = qe.tracker.phases
              .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
            captured.add(f"    action=$fn dur=${durationNs / 1e9}%.3f " +
              ph.mkString(" "))
          }
          override def onFailure(fn: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              e: Exception): Unit = ()
        })
      args.drop(1).foreach { name =>
        CacheLifecycle.releaseAll(spark); spark.catalog.clearCache(); System.gc()
        SparkEntry.queries(name)(spark, d).count()
        captured.clear()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, d)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        Thread.sleep(300)
        println(f"PHASES $name build=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f")
        import scala.jdk.CollectionConverters._
        captured.asScala.foreach(println)
      }
    } else if (args.headOption.contains("-sqlprof")) {
      // Operator-level metrics (the SQL-tab view): run the query twice
      // (bench warm-cache semantics), then dump each SQL execution's node
      // metrics from the status store.
      spark.range(100000).count()
      args.drop(1).foreach { name =>
        CacheLifecycle.releaseAll(spark); spark.catalog.clearCache(); System.gc()
        SparkEntry.queries(name)(spark, d).count()
        val store = spark.sharedState.statusStore
        val before = store.executionsList().map(_.executionId).toSet
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, d).count()
        println(f"SQLPROF $name wall=${(System.nanoTime() - t0) / 1e9}%.3f")
        Thread.sleep(500)
        store.executionsList().filterNot(e => before(e.executionId)).foreach { e =>
          val metrics = store.executionMetrics(e.executionId)
          val g = store.planGraph(e.executionId)
          val dur = e.completionTime.map(_.getTime).getOrElse(0L) -
            e.submissionTime
          println(f"  exec ${e.executionId} ${dur / 1e3}%.3fs nodes=${g.allNodes.size} metrics=${metrics.size} ${e.description.take(60)}")
          def walk(nodes: Seq[org.apache.spark.sql.execution.ui.SparkPlanGraphNode]): Unit =
            nodes.foreach {
              case c: org.apache.spark.sql.execution.ui.SparkPlanGraphCluster =>
                walk(c.nodes.toSeq)
              case n =>
                val m = n.metrics.flatMap(mm => metrics.get(mm.accumulatorId)
                  .map(v => s"${mm.name}=${v.replace('\n', ' ')}"))
                if (m.nonEmpty)
                  println(s"    [${n.id}] ${n.name}: ${m.mkString(" | ").take(260)}")
            }
          walk(g.allNodes.toSeq)
        }
      }
    } else if (args.headOption.contains("-q271dbg")) {
      import graft.CacheLifecycle.TrackedPersistOps
      val big = "decimal(38,0)"
      val x = Tables.embeddings(spark, d)
        .select(col("vec_id"), posexplode(expr("transform(embedding, v -> cast(v as double))")).as(Seq("i", "v")))
        .select(col("vec_id"), col("i"),
          (col("v").cast("decimal(18,9)") * 1000000000L).cast("long").as("xe"))
      val mu = x.groupBy(col("i")).agg(expr("sum(xe) div count(1)").as("mu"))
      val c = x.join(broadcast(mu), "i")
        .select(col("vec_id"), col("i"), (col("xe") - col("mu")).as("ce"))
        .persistTracked()
      val cov = c.as("a").join(c.as("b"), col("a.vec_id") === col("b.vec_id"))
        .groupBy(col("a.i").as("i"), col("b.i").as("j"))
        .agg(expr(s"cast(sum(cast(a.ce as $big) * cast(b.ce as $big))" +
          " div count(1) as bigint)").as("m"))
        .persistTracked()
      time("cov first count")(println("cov rows=" + cov.count()))
      time("cov second count")(cov.count())
      val v0 = mu.select(col("i").as("j"), lit(1000000000L).as("ve"))
        .localCheckpoint(true)
      time("step1 raw")(cov.join(broadcast(v0), "j").groupBy(col("i"))
        .agg(sum(col("m").cast(big) * col("ve").cast(big)).as("raw"))
        .localCheckpoint(true))
      time("step2 raw")(cov.join(broadcast(v0), "j").groupBy(col("i"))
        .agg(sum(col("m").cast(big) * col("ve").cast(big)).as("raw"))
        .localCheckpoint(true))
      time("join-only count")(cov.join(broadcast(v0), "j").count())
      time("join-only count 2")(cov.join(broadcast(v0), "j").count())
      time("long agg")(cov.join(broadcast(v0), "j").groupBy(col("i"))
        .agg(sum(col("m")).as("raw")).localCheckpoint(true))
      time("long agg 2")(cov.join(broadcast(v0), "j").groupBy(col("i"))
        .agg(sum(col("m")).as("raw")).localCheckpoint(true))
      time("dec38 agg no join")(cov.groupBy(col("i"))
        .agg(sum(col("m").cast(big) * col("m").cast(big)).as("raw"))
        .localCheckpoint(true))
      time("dec38 agg no join 2")(cov.groupBy(col("i"))
        .agg(sum(col("m").cast(big) * col("m").cast(big)).as("raw"))
        .localCheckpoint(true))
      time("collect cov")(println("n=" + cov.collect().length))
      time("collect cov 2")(println("n=" + cov.collect().length))
    } else if (args.headOption.contains("-prof")) {
      // Per-query job/stage profile: the local[32] stand-in for the Spark
      // UI's stage table (guide §1/§7). One warm run, then a profiled run
      // with a listener summing jobs, stages, task time, shuffle bytes.
      import org.apache.spark.scheduler._
      import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
      val jobs = new AtomicInteger(0)
      val stages = new AtomicInteger(0)
      val taskMs = new AtomicLong(0)
      val shufR = new AtomicLong(0)
      val shufW = new AtomicLong(0)
      val inB = new AtomicLong(0)
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val jobLine = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          jobStart.put(j.jobId, j.time)
        }
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          val t0 = Option(jobStart.get(j.jobId)).getOrElse(j.time)
          jobLine.add(f"  job ${j.jobId}%4d ${(j.time - t0) / 1e3}%7.3fs")
        }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          val si = sc.stageInfo
          taskMs.addAndGet(si.taskMetrics.executorRunTime)
          shufR.addAndGet(si.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(si.taskMetrics.shuffleWriteMetrics.bytesWritten)
          inB.addAndGet(si.taskMetrics.inputMetrics.bytesRead)
          if (si.taskMetrics.executorRunTime > 1000)
            jobLine.add(f"  stage ${si.stageId}%4d taskSec=" +
              f"${si.taskMetrics.executorRunTime / 1e3}%7.2f tasks=${si.numTasks}" +
              f" gc=${si.taskMetrics.jvmGCTime / 1e3}%.2f" +
              f" deser=${si.taskMetrics.executorDeserializeTime / 1e3}%.2f" +
              f" cpu=${si.taskMetrics.executorCpuTime / 1e9}%.2f" +
              f" ${si.name.take(60)}")
        }
      }
      spark.range(100000).count()
      args.drop(1).foreach { name =>
        def reset(): Unit = {
          CacheLifecycle.releaseAll(spark); spark.catalog.clearCache()
          System.gc()
        }
        reset()
        // Bench semantics: runs 2/3 of a query reuse run 1's intra-query
        // persists (reset only BETWEEN queries), so the graded number is
        // the warm-cache minimum. Profile run 2 accordingly.
        val tw0 = System.nanoTime()
        SparkEntry.queries(name)(spark, d).count() // run 1: builds caches
        val warm = (System.nanoTime() - tw0) / 1e9
        jobStart.clear(); jobLine.clear()
        jobs.set(0); stages.set(0); taskMs.set(0)
        shufR.set(0); shufW.set(0); inB.set(0)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, d).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async: give it a beat before reading counters
        Thread.sleep(400)
        spark.sparkContext.removeSparkListener(listener)
        println(f"PROF $name wall=$wall%.3f warm1=$warm%.3f jobs=${jobs.get}" +
          f" stages=${stages.get} taskSec=${taskMs.get / 1e3}%.2f" +
          f" input=${inB.get / 1e6}%.1fMB shufR=${shufR.get / 1e6}%.1fMB" +
          f" shufW=${shufW.get / 1e6}%.1fMB")
        import scala.jdk.CollectionConverters._
        jobLine.asScala.foreach(println)
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
