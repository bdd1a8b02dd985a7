package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Incrementally-maintained aggregate table — the "streaming materialized
  * view" production pattern: each micro-batch's PARTIAL aggregates merge
  * into a persistent rollup table, so the dashboard query reads a small
  * pre-aggregated table instead of re-scanning the event history. This is
  * the continuous form of the reference's hourly batch → warehouse →
  * Metabase loop (SURVEY.md §1.1): the reference recomputes its dashboard
  * aggregation from the warehouse on every view; at 100 TB of events the
  * rollup table IS the only viable dashboard source.
  *
  * Correctness contracts:
  *  - merge keys are the GROUP BY keys; merged measures must be
  *    sum-mergeable (counts, sums — avg is derived at read time). Sums
  *    ride the repo's decimal convention so merge order cannot change the
  *    result (decimal addition is exact; double addition is not
  *    associative).
  *  - exactly-once across replays: foreachBatch re-delivers a batch after
  *    checkpoint recovery, and a blind merge would double-count it. A
  *    per-table ledger of committed batch ids (one marker file per batch,
  *    written AFTER the table commit) makes [[mergeInto]] idempotent: a
  *    replayed batch id is a no-op. Marker-after-data ordering means a
  *    crash between the two re-merges the batch — the ledger converts
  *    at-least-once delivery into exactly-once table state.
  *
  * Scale: each merge reads the current rollup (keys-cardinality-sized —
  * hours × event types, NOT event-count-sized), unions the batch partials,
  * and re-aggregates — one shuffle over rollup-sized data per batch. The
  * write is localCheckpointed first (the read-then-overwrite-same-path
  * trap: without materialization the overwrite would delete its own
  * input). Single-writer per table, like [[graft.etl.Upsert]].
  */
object Rollup {

  /** Partial hourly aggregates of one events micro-batch (or of a batch
    * DataFrame — the shapes are identical, which is the point: the merge
    * never needs to know whether its input came from a stream). Sums are
    * kept in decimal(18,2) for exact mergeability. */
  def hourlyPartials(events: DataFrame): DataFrame = events
    .groupBy(col("event_type"),
      date_format(date_trunc("hour", col("ts_us")), "yyyy-MM-dd HH:mm:ss")
        .as("hour_start"))
    .agg(count(lit(1)).as("n_events"),
      sum(col("value").cast("decimal(18,2)")).as("sum_value"))

  private def ledgerDir(tablePath: String) = s"$tablePath/_committed_batches"

  private def committed(spark: SparkSession, tablePath: String, batchId: Long): Boolean = {
    val p = new Path(s"${ledgerDir(tablePath)}/$batchId")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def markCommitted(spark: SparkSession, tablePath: String, batchId: Long): Unit = {
    val p = new Path(s"${ledgerDir(tablePath)}/$batchId")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(p, true).close()
  }

  /** Merge one batch of partial aggregates into the rollup table at
    * `tablePath`. `keys` are the grouping columns; every other column is
    * summed. Idempotent per `batchId` (see class doc). Returns true when
    * the merge ran, false when the batch id was already committed. */
  def mergeInto(spark: SparkSession, partials: DataFrame, tablePath: String,
      keys: Seq[String], batchId: Long): Boolean = {
    if (committed(spark, tablePath, batchId)) return false
    val aggCols = partials.columns.filterNot(keys.contains)
    val existing =
      try spark.read.parquet(tablePath).select(partials.columns.map(col): _*)
      catch { case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], partials.schema)
      }
    val merged = existing.unionByName(partials)
      .groupBy(keys.map(col): _*)
      .agg(aggCols.map(c => sum(col(c)).as(c)).toSeq.head,
        aggCols.map(c => sum(col(c)).as(c)).toSeq.tail: _*)
      // materialize BEFORE the overwrite deletes the input files
      .localCheckpoint(eager = true)
    merged.write.mode("overwrite").parquet(tablePath)
    markCommitted(spark, tablePath, batchId)
    true
  }

  /** Drain the events backlog into an incrementally-maintained hourly
    * rollup at `tablePath` (AvailableNow, the reference's catchup=False
    * batch shape). Restart-safe: the streaming checkpoint resumes the
    * source position, and the batch ledger absorbs any replayed batch. */
  def hourlyRollupSink(spark: SparkSession, dir: String, tablePath: String,
      checkpointDir: String, glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val q = Streams.eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeInto(spark, hourlyPartials(batch), tablePath,
          Seq("event_type", "hour_start"), id)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
