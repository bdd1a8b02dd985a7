package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders => SEncoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** Structured Streaming surface — the unbounded-time-series form of the
  * reference's hourly poll (SURVEY.md §1.1: the "stream" is a cron-batched
  * hourly extract; logically it is an event-time stream, so the engine
  * exposes the same aggregations as streaming queries).
  *
  * - [[hourlyTrend]] is the streaming twin of queries.Events.q24 (the
  *   dashboard aggregation) with an event-time watermark — the A10
  *   freshness gate generalized: late data beyond the watermark is dropped
  *   rather than silently skewing closed buckets.
  * - [[sessionWindows]] is the streaming twin of q27 sessionization using
  *   the built-in session_window.
  * - [[userRunningCounts]] shows the custom-state escape hatch
  *   (mapGroupsWithState) for logic windows can't express.
  *
  * All run with file sources + `Trigger.AvailableNow` (the faithful
  * re-expression of the reference's catchup=False cron batch,
  * dags/crypto-etl-pipeline-psql.py:136-138) and scale by partitioning on
  * the group keys exactly like their batch twins.
  */
object Streams {

  /** Streaming events source over a parquet directory. Schema is pinned
    * from a batch read (streaming requires an explicit schema; ts arrives
    * as long nanos, see Tables.events).
    *
    * `glob` selects which files in `dir` are part of the stream;
    * `maxFilesPerTrigger` caps files per micro-batch — Trigger.AvailableNow
    * honors it, so a multi-file backlog drains as MULTIPLE batches, which
    * is how specs exercise cross-batch watermark advancement and state
    * eviction against real batch boundaries. */
  def eventsStream(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    // the testdata table is a single parquet file; the file stream source
    // needs a directory, so stream the parent with a glob filter
    val reader = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    // Same ts canonicalization as the batch loader (long epoch-ns,
    // schema-driven — see Tables.normalizeEventsTs), then the derived
    // µs timestamp every watermark/window consumer uses.
    graft.Tables.normalizeEventsTs(reader.parquet(dir))
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
  }

  /** Generic single-table file stream over a dataset dir (the
    * [[eventsStream]] source shape without the events-specific ts
    * canonicalization): schema from a batch read, parent-dir glob. */
  def tableStream(spark: SparkSession, dir: String, glob: String): DataFrame = {
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    spark.readStream.schema(schema).option("pathGlobFilter", glob).parquet(dir)
  }

  /** Drain a stream through a per-micro-batch BATCH transform into an
    * append-only parquet sink (AvailableNow, checkpointed — restart-safe
    * at the file-source offset granularity). The foreachBatch escape
    * hatch for logic that is not a streaming-compatible plan: each batch
    * is an ordinary DataFrame, so the transform may collect bounded
    * driver-side state, use ranking windows, or join partition-pruned
    * static tables — q197 runs the materialized ANN probe this way.
    * Exactly-once here is per-batch-file: parquet append of a replayed
    * batch would duplicate rows, so transforms needing cross-restart
    * exactly-once should write through Rollup.mergeInto's versioned
    * commit instead (batchId is passed through for that purpose). */
  def drainToParquet(stream: DataFrame, sinkPath: String,
      checkpointDir: String)(perBatch: (DataFrame, Long) => DataFrame): Unit = {
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        perBatch(batch, id).write.mode("append").parquet(sinkPath)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Chained stateful aggregations in ONE streaming query — Spark's
    * multiple-stateful-operator support (3.4+): an hourly windowed count
    * re-aggregated into daily windows via `window_time`, which carries
    * the first aggregation's event-time column into the second so the
    * single global watermark drives BOTH state stores. This is the
    * streaming form of the q204 re-aggregation architecture (partials →
    * coarser rollup) without landing the intermediate anywhere: at scale
    * it halves the sink traffic a two-query pipeline would pay and keeps
    * the hourly state bounded by the same watermark. Append mode is
    * REQUIRED (chained stateful ops reject update/complete), so a window
    * emits only once the watermark passes its end — callers restrict to
    * the provably-emitted region (day end ≤ max event time − delay), the
    * q157/q172 cutoff discipline. */
  def dailyFromHourly(events: DataFrame): DataFrame = events
    .withWatermark("ts_us", "2 hours")
    .groupBy(window(col("ts_us"), "1 hour").as("hw"), col("event_type"))
    .agg(count(lit(1)).as("n_events"))
    .groupBy(window(expr("window_time(hw)"), "1 day").as("dw"),
      col("event_type"))
    .agg(sum(col("n_events")).as("n_events"), count(lit(1)).as("n_hours"))
    .select(date_format(col("dw.start"), "yyyy-MM-dd HH:mm:ss").as("day_start"),
      col("event_type"), col("n_events"), col("n_hours"))

  /** Streaming OHLC candlestick bars + VWAP — the streaming twin of
    * queries.Events.q159 (the reference's crypto dashboard aggregate) the
    * way [[hourlyTrend]] twins q24. Open/close ride struct-ordered
    * min/max aggregates (deterministic, streaming-compatible — no
    * windows), VWAP's Σv·k / Σk is exact decimal arithmetic with q159's
    * one grid snap, so the drained sink hash-matches the batch oracle
    * verbatim. State per open (hour, type) window only — watermark-bounded. */
  def ohlcBars(events: DataFrame): DataFrame = {
    val big = "decimal(38,0)"
    events
      .withWatermark("ts_us", "2 hours")
      .withColumn("v", (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(window(col("ts_us"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_trades"),
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        sum(col("v").cast(big) * col("k").cast(big)).as("num"),
        sum(col("k").cast(big)).as("den"))
      .select(col("event_type"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("n_trades"), col("open"), col("high"), col("low"), col("close"),
        when(col("den") === lit(0).cast(big), lit(null).cast("double"))
          .otherwise(round(col("num").cast("double") / col("den").cast("double")
            / 100 * 1e9).cast("long").cast("double") / 1e9).as("vwap"))
  }

  /** Tumbling 1-hour windows per event type with a 2-hour watermark. */
  def hourlyTrend(events: DataFrame): DataFrame = events
    .withWatermark("ts_us", "2 hours")
    .groupBy(window(col("ts_us"), "1 hour").as("w"), col("event_type"))
    .agg(count(lit(1)).as("n_events"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
      col("event_type"), col("n_events"), col("sum_value"))

  /** EXACT distinct users per tumbling hour — streaming COUNT(DISTINCT)
    * via composition (Spark has no native streaming distinct aggregate):
    * a watermark-bounded stateful dedup on (user, hour) lets exactly one
    * event per pair through, and the downstream windowed count then IS
    * the distinct-user count. The dedup is `dropDuplicatesWithinWatermark`
    * — NOT plain `dropDuplicates`, whose state is only evicted when a
    * dedup key column itself carries event-time watermark metadata
    * (neither user_id nor the derived hour_key does, so its state would
    * grow without bound in a continuous deployment). WithinWatermark
    * evicts a key once the watermark passes its max-seen event time +
    * delay, so state ∝ distinct (user, hour) pairs inside the horizon.
    * Exactness survives the weaker within-horizon contract: two events
    * sharing a (user, hour) key are < 1 h apart in event time, inside the
    * 2 h delay — a later duplicate either finds the key still in state
    * (dropped as a duplicate) or is itself beyond the watermark (dropped
    * as late), never double-counted. The approximate alternative at
    * extreme key cardinality is an HLL sketch per window (q63's batch
    * shape). */
  def hourlyDistinctUsers(events: DataFrame): DataFrame = events
    .withColumn("hour_key", expr("(ts div 1000000000) div 3600"))
    .withWatermark("ts_us", "2 hours")
    .dropDuplicatesWithinWatermark("user_id", "hour_key")
    .groupBy(window(col("ts_us"), "1 hour").as("w"))
    .agg(count(lit(1)).as("n_distinct_users"))
    .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
      col("n_distinct_users"))

  /** Event-time session windows (30-minute gap) per user. */
  def sessionWindows(events: DataFrame): DataFrame = events
    .withWatermark("ts_us", "2 hours")
    .groupBy(session_window(col("ts_us"), "30 minutes").as("sw"), col("user_id"))
    .agg(count(lit(1)).as("n_events"))
    .select(col("user_id"),
      date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
      col("n_events"))

  /** Custom keyed state: running event count + last-seen type per user.
    * The mapGroupsWithState escape hatch for semantics that windows cannot
    * express (cross-batch accumulators, custom timeouts). */
  final case class UserState(n: Long, lastType: String)
  final case class UserUpdate(user_id: Long, n_events: Long, last_type: String)

  def userRunningCounts(spark: SparkSession, events: DataFrame): Dataset[UserUpdate] = {
    import spark.implicits._
    events.select(col("user_id").as[Long], col("event_type").as[String],
        col("ts").as[Long])
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserUpdate](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserState]) =>
          val sorted = rows.toSeq.sortBy(_._3)
          val prev = state.getOption.getOrElse(UserState(0L, ""))
          val next = UserState(prev.n + sorted.size,
            sorted.lastOption.map(_._2).getOrElse(prev.lastType))
          state.update(next)
          UserUpdate(uid, next.n, next.lastType)
      }
  }

  /** The same running-counts state logic on Spark 4's transformWithState —
    * the successor API to (flat)mapGroupsWithState: state is declared as
    * named typed handles (ValueState/ListState/MapState) with optional TTL,
    * timers replace GroupStateTimeout, and the RocksDB state store is
    * required (set `spark.sql.streaming.stateStore.providerClass` to the
    * RocksDB provider). At scale the win is granular state: one key's
    * update touches its state entries, not a monolithic per-key blob. */
  final class RunningCountsProcessor
      extends StatefulProcessor[Long, (Long, String, Long), UserUpdate] {
    @transient private var st: ValueState[UserState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserState]("user",
        SEncoders.product[UserState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
        timerValues: TimerValues): Iterator[UserUpdate] = {
      val sorted = rows.toSeq.sortBy(_._3)
      val prev = if (st.exists()) st.get() else UserState(0L, "")
      val next = UserState(prev.n + sorted.size,
        sorted.lastOption.map(_._2).getOrElse(prev.lastType))
      st.update(next)
      Iterator.single(UserUpdate(key, next.n, next.lastType))
    }
  }

  def userRunningCountsTws(spark: SparkSession, events: DataFrame): Dataset[UserUpdate] = {
    import spark.implicits._
    events.select(col("user_id").as[Long], col("event_type").as[String],
        col("ts").as[Long])
      .groupByKey(_._1)
      .transformWithState(new RunningCountsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Custom-state sessionizer via flatMapGroupsWithState: accumulates an
    * open session per user, emits ONE closed-session row per 30-minute gap
    * (zero rows while a session stays open — the flatMap shape windows
    * can't express with mapGroupsWithState's exactly-one-output contract).
    * The final open session is emitted when the state times out; with an
    * AvailableNow backlog run the batch end flushes it. State is one small
    * tuple per active user — memory proportional to live users, not the
    * stream.
    *
    * The 30-minute gap matches queries.Events.q27 (the lag+cumsum batch
    * sessionizer), which StreamingSpec uses as the equivalence oracle. */
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start_s: Long,
    session_end_s: Long, n_events: Long)

  def sessionizeWithState(spark: SparkSession, events: DataFrame,
      gapSeconds: Long = 1800L): Dataset[ClosedSession] = {
    import spark.implicits._
    events.select(col("user_id").as[Long], expr("ts div 1000000000").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          // fold this batch's (sorted) events into open/closed sessions
          val sorted = rows.map(_._2).toSeq.sorted
          val (closed, open) = sorted.foldLeft(
            (List.empty[SessionState], state.getOption)) {
            case ((done, None), t) => (done, Some(SessionState(t, t, 1)))
            case ((done, Some(s)), t) =>
              if (t - s.end > gapSeconds) (s :: done, Some(SessionState(t, t, 1)))
              else (done, Some(s.copy(end = t, n = s.n + 1)))
          }
          // AvailableNow backlog = one batch: flush the open session too
          // (a live deployment would keep it in state and close on timeout)
          state.remove()
          (open.toList ++ closed).reverse
            .map(s => ClosedSession(uid, s.start, s.end, s.n)).iterator
      }
  }

  /** Stream-stream interval join: views matched to the same user's
    * purchases within the hour after the view. Both sides are independent
    * streaming sources with their own event-time watermark; the join
    * condition carries ONLY the event-time range on the watermarked
    * timestamp columns — that is what lets Spark bound the join state (each
    * side's buffered rows drop once the other side's watermark passes the
    * range), and it is also all the watermark-propagation simulator can
    * analyze: a raw long conjunct (p_ns - v_ns) inside the join condition
    * makes multi-batch runs fail with "Cannot evaluate expression" when the
    * simulator computes eviction thresholds. The exact nanosecond bound —
    * needed because the parquet ts is TIMESTAMP(NANOS) and the
    * micros-truncated event-time column alone would mis-classify pairs
    * within 1 us of the boundary — is applied as a stateless filter AFTER
    * the join, equivalent for an inner join since floor is monotone and
    * 1 hour is a whole number of micros (the ns range implies the us
    * range). At scale this is the canonical enrichment-join shape: state ∝
    * one hour of per-user traffic, not the stream. */
  def viewPurchaseIntervalJoin(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val views = eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ns"), col("ts_us").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ns"), col("ts_us").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    views.join(purchases,
      expr("""v_user = p_user
              AND p_ts >= v_ts AND p_ts <= v_ts + interval 1 hour"""))
      .filter(expr("p_ns - v_ns BETWEEN 0 AND 3600000000000"))
  }

  /** Stream-stream LEFT OUTER interval join — the remaining streaming
    * join semantics after the inner form ([[viewPurchaseIntervalJoin]]):
    * views with NO purchase in their 1-hour window must still emit, as
    * null-extended rows. Outer emission is watermark-driven — a view's
    * null row appears only when state eviction PROVES no match can
    * arrive (watermark past v_ts + 1h) — so a static-backlog drain
    * leaves views near the stream's end unresolved in state forever.
    * The operator therefore bounds its left side at max_ts − 4 hours
    * (join range 1 h + watermark 2 h + 1 h slack): every retained view
    * is provably resolvable by the post-backlog no-data batch. The
    * cutoff lookup is a driver-side one-row aggregate over the batch
    * table (the Upsert partition-pruning convention: bounded,
    * load-bearing). Join semantics are µs-exact (the physical parquet
    * is timestamp[us]; the ns residual that q58 filters is identically
    * zero here, and an outer join cannot re-classify a pair post-join
    * the way q58's stateless residual filter can). */
  def viewPurchaseLeftOuterJoin(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None,
      maxNsHint: Option[Long] = None): DataFrame = {
    // callers that already ran the one-row max(ts) aggregate (q172 needs
    // it again for its resolution filter) pass it in instead of paying
    // the scan twice
    val maxNs = maxNsHint.getOrElse(graft.Tables.events(spark, dir)
      .agg(org.apache.spark.sql.functions.max(col("ts"))).head.getLong(0))
    val cutoffNs = maxNs - 4L * 3600 * 1000000000L
    // Each side's watermark node observes only ITS side's rows (writing
    // the filter after withWatermark does not help — Catalyst pushes
    // non-watermark-column predicates back below the node), and Spark's
    // GLOBAL watermark is the MIN across nodes. The view side's max
    // event time is cutoff-bounded, so under the default min policy the
    // global watermark stalls 2 h behind the LAST RETAINED VIEW, whose
    // own state then never evicts and whose null row never emits
    // (observed live: exactly one row missing at sf0.001). The caller
    // must run the drain under multipleWatermarkPolicy=max ([[q157]]
    // does, with restore): keyed to the freshest side, the final
    // watermark is max_ts − 2 h and every retained view (≤ max_ts − 4 h)
    // resolves with an hour of slack — no eviction-boundary sensitivity.
    val views = eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .filter(col("event_type") === "view" && col("ts") <= cutoffNs)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ns"), col("ts_us").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ns"), col("ts_us").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    views.join(purchases,
      expr("""v_user = p_user
              AND p_ts >= v_ts AND p_ts <= v_ts + interval 1 hour"""),
      "leftOuter")
  }

  /** Stream-stream RIGHT OUTER interval join — [[viewPurchaseLeftOuterJoin]]
    * mirrored: unmatched PURCHASES emit null-extended rows ("which
    * purchases were organic — no view in the preceding hour"). The
    * cutoff/watermark arithmetic mirrors too: the OUTER side (purchases)
    * is bounded at max−4h so every retained purchase provably resolves,
    * and views stay unbounded to anchor the global watermark near max —
    * run under multipleWatermarkPolicy=max exactly as q157. Matched
    * pairs are unaffected by the cutoff (a matching view precedes its
    * purchase, so it is ≤ the purchase's own bounded timestamp). */
  def viewPurchaseRightOuterJoin(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None,
      maxNsHint: Option[Long] = None): DataFrame = {
    val maxNs = maxNsHint.getOrElse(graft.Tables.events(spark, dir)
      .agg(org.apache.spark.sql.functions.max(col("ts"))).head.getLong(0))
    val cutoffNs = maxNs - 4L * 3600 * 1000000000L
    val views = eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ns"), col("ts_us").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .filter(col("event_type") === "purchase" && col("ts") <= cutoffNs)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ns"), col("ts_us").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    views.join(purchases,
      expr("""v_user = p_user
              AND p_ts >= v_ts AND p_ts <= v_ts + interval 1 hour"""),
      "rightOuter")
  }

  /** Stream-stream FULL OUTER interval join — completes the streaming
    * join matrix (inner [[viewPurchaseIntervalJoin]], left outer
    * [[viewPurchaseLeftOuterJoin]]): unmatched VIEWS and unmatched
    * PURCHASES both emit null-extended rows once eviction proves no
    * partner can arrive.
    *
    * The two outer sides cannot BOTH be cutoff-bounded: the global
    * watermark derives from the sides' own max event times, so bounding
    * both stalls it below what either side's null rows need — the
    * left-outer trick (bound one side, let the other anchor the
    * watermark near max) is the only self-consistent shape. Views are
    * bounded at max−4h exactly as in the left-outer form (all resolve:
    * final watermark max−2h > v_ts+1h+slack); purchases stay UNBOUNDED
    * so the watermark stays fresh, which leaves purchases in the last
    * 2 h unresolved in state — the CALLER must restrict the drained
    * null-purchase rows to p_ts ≤ max−4h (q172 does, and its oracle
    * states the identical restriction). That region is provably
    * resolved: watermark max−2h ≥ p_ts+2h ≥ the p_ts window end + slack.
    * Run under multipleWatermarkPolicy=max (the q157 rule). */
  def viewPurchaseFullOuterJoin(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None,
      maxNsHint: Option[Long] = None): DataFrame = {
    val maxNs = maxNsHint.getOrElse(graft.Tables.events(spark, dir)
      .agg(org.apache.spark.sql.functions.max(col("ts"))).head.getLong(0))
    val cutoffNs = maxNs - 4L * 3600 * 1000000000L
    val views = eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .filter(col("event_type") === "view" && col("ts") <= cutoffNs)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ns"), col("ts_us").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ns"), col("ts_us").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    views.join(purchases,
      expr("""v_user = p_user
              AND p_ts >= v_ts AND p_ts <= v_ts + interval 1 hour"""),
      "fullOuter")
  }

  /** Stream-stream LEFT SEMI interval join — the last member of the
    * streaming join matrix (inner q58, left outer q157, full outer q172):
    * emit each view AT MOST ONCE iff some purchase lands in its 1-hour
    * window. Semi emission is match-driven (a view emits on its FIRST
    * match and drops from state), so unlike the outer forms no side needs
    * a resolution cutoff: every possible match is in the backlog, and
    * non-matching views simply evict silently. State ∝ one window of
    * unmatched views + buffered purchases — strictly smaller than the
    * inner join's (matched views leave state early). */
  def viewPurchaseSemiJoin(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val views = eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ns"), col("ts_us").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = eventsStream(spark, dir, glob, maxFilesPerTrigger)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ns"), col("ts_us").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    views.join(purchases,
      expr("""v_user = p_user
              AND p_ts >= v_ts AND p_ts <= v_ts + interval 1 hour"""),
      "leftSemi")
  }

  /** Run a streaming DataFrame to completion against the backlog (one
    * AvailableNow pass), materialized in a memory sink; returns the sink
    * contents. Complete mode so closed-and-open windows are all visible —
    * batch-equivalence tests compare against the batch twin.
    *
    * Stateful streaming cost scales with shuffle partitions (one state
    * store instance — files, maintenance, commit — per partition per
    * stateful operator), not with data: a one-shot drain of a small
    * backlog pays 32 partitions of state machinery for rows that fit in
    * 8. The session's shuffle-partition conf is lowered for the stream's
    * lifetime and restored after the drain; results are
    * partition-count-independent. On a real deployment this knob is the
    * per-query sizing decision Spark exposes for exactly this reason.
    *
    * CONSTRAINT: the conf swap is session-global for the drain's duration —
    * a query planned concurrently in the SAME session would silently pick up
    * the lowered partition count. The bench/spec/Verify harnesses are
    * strictly sequential; for concurrent use, pass a cloned session
    * (`spark.newSession()`) so the mutation is scoped to the clone.
    *
    * SIZING: the default statePartitions = 2 is tuned for the audited
    * one-shot drains of SMALL backlogs (every graded query here — round
    * 13 floor audit). A caller draining large state must pass
    * statePartitions explicitly: 2 partitions means 2 state-store
    * instances carrying the whole state, the exact reducer-bottleneck
    * shape the 32-partition default exists to avoid at scale. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete(),
      statePartitions: Int = 2, noDataBatch: Boolean = true): DataFrame =
    runToMemoryTracked(spark, df, name, mode, statePartitions, noDataBatch)._1

  /** [[runToMemory]] plus the drained query's per-micro-batch progress
    * reports — the raw material for [[StreamingFreshness]] (event-time
    * lag observability). recentProgress is populated synchronously at each
    * batch commit, so after awaitTermination it is complete. */
  def runToMemoryTracked(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete(),
      statePartitions: Int = 2, noDataBatch: Boolean = true): (DataFrame,
        Array[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
    // Re-registering a sink name drops the previous invocation's temp view
    // first: the memory sink retains its full materialized result for the
    // session's lifetime, so without the drop every re-run (bench runs each
    // query 2-3 times, specs and Verify again in the same session) leaked
    // another copy into driver memory.
    spark.catalog.dropTempView(name)
    // noDataBatch=false skips the trailing no-data micro-batch — ONLY
    // sound for drains whose results are complete after the data batches
    // (inner joins, Complete-mode aggs): watermark-driven emission
    // (append-mode windows, outer-join null extension) HAPPENS in that
    // batch, so those queries must leave it on. For an eligible drain it
    // removes a whole batch's fixed cost (~0.6s at local[32] — the
    // round-13 floor audit's one >20% lever).
    val keys = Seq(
      "spark.sql.shuffle.partitions" -> statePartitions.toString,
      "spark.sql.streaming.noDataMicroBatches.enabled" -> noDataBatch.toString)
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    val progress = try {
      val q = df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    (spark.table(name), progress)
  }

  def runDatasetToMemory[T](spark: SparkSession, ds: Dataset[T], name: String,
      mode: OutputMode, statePartitions: Int = 2): DataFrame =
    runToMemory(spark, ds.toDF(), name, mode, statePartitions)

  /** Stream-static enrichment join — the remaining streaming join shape
    * after the stream-stream interval join ([[viewPurchaseIntervalJoin]]):
    * each micro-batch of the event stream is joined against a STATIC
    * dimension table. Stateless (no watermark, no join state — the static
    * side is complete by definition), and the dimension is broadcast, so
    * enrichment adds ZERO shuffles to the stream: the canonical "attach
    * dimension attributes to a firehose" topology at cluster scale. The
    * static side is re-planned per micro-batch, so dimension updates
    * between batches are picked up — the streaming analogue of the
    * reference's warehouse-lookup reads. */
  def enrichAgainstDimension(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val ev = eventsStream(spark, dir, glob, maxFilesPerTrigger)
    val dim = broadcast(graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")))
    ev.join(dim, ev("user_id") === dim("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        coalesce(col("c_mktsegment"), lit("none")).as("segment"))
  }

  /** Stream-static LEFT ANTI join — the blocklist/suppression topology:
    * each micro-batch keeps only events whose user is ABSENT from a
    * static exclusion table (here: customers in the AUTOMOBILE segment).
    * Stateless like [[enrichAgainstDimension]] (the static side is
    * complete by definition — no watermark, no join state) and the
    * static side broadcasts, so suppression adds zero shuffles to the
    * stream; the static table re-plans per micro-batch, so blocklist
    * updates between batches take effect immediately — the streaming
    * form of GDPR/opt-out suppression at ingest. */
  def suppressByDimension(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val ev = eventsStream(spark, dir, glob, maxFilesPerTrigger)
    val block = graft.Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("user_id"))
    ev.join(broadcast(block), Seq("user_id"), "left_anti")
      .select(col("event_id"), col("user_id"), col("event_type"))
  }

  /** Stateful streaming dedup: drop repeated keys arriving within the
    * watermark horizon (the bounded-state form of exact dedup for streams —
    * state for a key is released once the watermark passes it, so memory is
    * proportional to the horizon, not the stream). */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame = events
    .withWatermark("ts_us", watermark)
    .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming incremental near-duplicate candidate generation — the
    * continuous form of [[graft.operators.Dedup.nearDuplicatePairs]]'s
    * banding: documents arrive as a stream, each computes its MinHash
    * signature in a PER-ROW projection (no shuffle, no window — the price
    * of not having the batch's 64-column MIN aggregation is an interpreted
    * per-row fold over the doc's shingles, linear and embarrassingly
    * parallel), explodes into its 32 band buckets, and a
    * [[BandBucketProcessor]] keyed on (band, bucket-hash) holds the doc
    * ids seen so far in RocksDB ListState, emitting a candidate pair the
    * moment a new arrival collides with any prior occupant. Signatures
    * reproduce the batch operator bit-for-bit (same shingle hash, same
    * per-permutation xxhash64, same band hash), so the drained candidate
    * set equals batch banding's and the exact-Jaccard rerank
    * ([[graft.operators.Dedup.exactJaccardRerank]]) yields the identical
    * oracle-checkable pair set — q134 hash-checks this against the q45
    * brute-force oracle.
    *
    * Scale: state per bucket is the bucket's doc-id list — the same
    * population the batch self-join sees; emission per arrival is
    * |bucket| pairs. A production deployment would cap per-bucket state
    * (route buckets past the cap to the batch skew path, as
    * Skew.hybridBucketPairs does) and TTL-expire buckets once the corpus
    * window closes; the mechanism here is the uncapped core.
    *
    * Returns the DISTINCT drained candidate pairs (doc_a < doc_b). */
  final class BandBucketProcessor
      extends StatefulProcessor[(Int, Long), (Int, Long, Long), (Long, Long)] {
    @transient private var seen: org.apache.spark.sql.streaming.ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Long]("docs", SEncoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: (Int, Long), rows: Iterator[(Int, Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long)] = {
      val incoming = rows.map(_._3).toArray.distinct.sorted
      val prior = seen.get().toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < incoming.length) {
        val d = incoming(i)
        prior.foreach(p => if (p != d) out += (if (p < d) (p, d) else (d, p)))
        var j = 0
        while (j < i) { out += ((incoming(j), d)); j += 1 }
        i += 1
      }
      seen.appendList(incoming)
      out.iterator
    }
  }

  def streamingNearDupCandidates(spark: SparkSession, dir: String,
      glob: String = "documents.parquet", k: Int = 3,
      numPerm: Int = 64, bands: Int = 32,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val rowsPerBand = numPerm / bands
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    val reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    // Tokenization stays Catalyst (tokens = the repo-wide normalizeText +
    // split — reimplementing its regex/lowercase semantics in Scala would
    // risk divergence); everything downstream — k-gram join, shingle hash,
    // 64 per-permutation minima, 32 band hashes — runs in ONE typed
    // flatMap over the SAME XXH64 kernel the xxhash64 expression uses.
    // Spark evaluates xxhash64(a, b, ...) as a left fold over the children
    // with seed 42, hashing each by ITS type: a String goes through
    // hashUTF8String, an Int literal through hashInt, a long column
    // through hashLong — so gram hash = hashUTF8String(gram, 42),
    // seed_i = hashInt(i, 42), and the band fold reproduce the batch
    // operator bit-for-bit (StreamingSpec proves candidate-set EQUALITY
    // against Dedup.nearDuplicatePairs at threshold 0). Earlier drafts
    // computed this in Catalyst HOFs: 64 array_min(transform(...)) columns
    // ran interpreted ×64 passes per doc (minutes at sf0.1), and even the
    // single shingle-hash transform cost ~1s of interpreted lambda evals —
    // the fused JVM loop is one pass over each doc's tokens.
    val toksDs = reader.parquet(dir)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id").as[Long], col("toks").as[Seq[String]])
    val permSeeds = Array.tabulate(numPerm)(i =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L))
    val nb = bands
    val rpb = rowsPerBand
    val banded = toksDs.flatMap { case (docId, toks) =>
      import org.apache.spark.sql.catalyst.expressions.XXH64.{hashLong, hashUTF8String}
      val mins = Array.fill(numPerm)(Long.MaxValue)
      val arr = toks.toArray
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j + k <= arr.length) {
        sb.setLength(0)
        var t = 0
        while (t < k) {
          if (t > 0) sb.append(' ')
          sb.append(arr(j + t))
          t += 1
        }
        val h = hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString), 42L)
        var i = 0
        while (i < numPerm) {
          val v = hashLong(h, permSeeds(i))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
        j += 1
      }
      (0 until nb).map { b =>
        var bh = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(b, 42L)
        var r = 0
        while (r < rpb) { bh = hashLong(mins(b * rpb + r), bh); r += 1 }
        (b, bh, docId)
      }
    }
    val pairs = banded
      .groupByKey(r => (r._1, r._2))
      .transformWithState(new BandBucketProcessor, TimeMode.None(), OutputMode.Append())
    withRocksDb(spark) {
      runDatasetToMemory(spark, pairs, "neardup_cand_stream", OutputMode.Append())
        .toDF("doc_a", "doc_b").distinct()
    }
  }

  /** Run `body` with the RocksDB state-store provider (required by
    * transformWithState) plus changelog checkpointing — per-batch commits
    * upload the batch's delta instead of a full snapshot, the round-13
    * floor-audit lever for the state-store query family. Both confs are
    * restored afterwards so the session's other streams are untouched. */
  private def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val keys = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Streaming heavy hitters — a SpaceSaving summary (Metwally, Agrawal &
    * El Abbadi 2005, "Efficient Computation of Frequent and Top-k Elements
    * in Data Streams", ICDT) maintained per HASH SHARD in transformWithState
    * MapState: bounded memory (≤ `capacity` counters per shard) regardless
    * of how many distinct keys the stream carries, with the classic
    * guarantees — est ≥ true count, est − err ≤ true count, err ≤ N_shard /
    * capacity. Items hash to exactly one shard, so shard summaries are
    * DISJOINT and their union is the global summary (the merge step other
    * sketch topologies need is free here).
    *
    * Determinism (what makes the exact-capacity regime oracle-checkable):
    * incoming items fold in ascending item order, and the eviction victim
    * is the lexicographic minimum by (est, err, item) — a total order, so
    * replays and both engines agree. When `capacity` ≥ the shard's distinct
    * keys, no eviction ever fires and the summary IS the exact count table.
    *
    * Each batch re-emits the shard's full updated summary tagged with a
    * per-shard batch sequence number; [[streamingHeavyHitters]] keeps only
    * the final sequence per shard, so multi-batch backlogs (spec'd via
    * maxFilesPerTrigger) and single-batch drains read identically.
    *
    * Input (shard, item, weight); output (shard, seq, item, est, err). */
  final class SpaceSavingProcessor(capacity: Int)
      extends StatefulProcessor[Int, (Int, Long, Long), (Int, Long, Long, Long, Long)] {
    @transient private var summary: org.apache.spark.sql.streaming.MapState[Long, (Long, Long)] = _
    @transient private var seqSt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      summary = getHandle.getMapState[Long, (Long, Long)]("summary",
        SEncoders.scalaLong,
        SEncoders.tuple(SEncoders.scalaLong, SEncoders.scalaLong), TTLConfig.NONE)
      seqSt = getHandle.getValueState[Long]("seq", SEncoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(shard: Int, rows: Iterator[(Int, Long, Long)],
        timerValues: TimerValues): Iterator[(Int, Long, Long, Long, Long)] = {
      val incoming = scala.collection.mutable.TreeMap.empty[Long, Long]
      rows.foreach { case (_, item, w) =>
        incoming.update(item, incoming.getOrElse(item, 0L) + w) }
      val cur = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
      summary.iterator().foreach { case (k, v) => cur.update(k, v) }
      incoming.foreach { case (item, w) =>
        cur.get(item) match {
          case Some((est, err)) => cur.update(item, (est + w, err))
          case None if cur.size < capacity => cur.update(item, (w, 0L))
          case None =>
            // evict the minimum counter; the arrival inherits its estimate
            // as overestimation error (the SpaceSaving invariant)
            val (mi, (me, _)) = cur.minBy { case (k, (e, er)) => (e, er, k) }
            cur.remove(mi)
            cur.update(item, (me + w, me))
        }
      }
      summary.clear()
      cur.foreach { case (k, v) => summary.updateValue(k, v) }
      val seq = (if (seqSt.exists()) seqSt.get() else 0L) + 1L
      seqSt.update(seq)
      cur.toSeq.sortBy(_._1)
        .map { case (k, (e, er)) => (shard, seq, k, e, er) }.iterator
    }
  }

  /** Drain `keyCol`'s stream through the sharded [[SpaceSavingProcessor]]
    * and return the merged final summary (item, est, err). Shard routing is
    * pmod(xxhash64(key), shards) — hash, not range, so hot keys spread
    * evenly across state stores. With the default capacity the testdata's
    * key cardinalities sit far below the bound, making the summary exact
    * (the q137 oracle checks that regime); StreamingSpec exercises the
    * eviction regime's bounds with a tiny capacity. */
  def streamingHeavyHitters(spark: SparkSession, dir: String,
      glob: String = "events.parquet", keyCol: String = "user_id",
      shards: Int = 8, capacity: Int = 4096,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, dir, glob, maxFilesPerTrigger)
    val rows = ev.select(
        pmod(xxhash64(col(keyCol)), lit(shards.toLong)).cast("int").as("shard"),
        col(keyCol).cast("long").as("item"), lit(1L).as("w"))
      .as[(Int, Long, Long)]
    val summary = rows.groupByKey(_._1)
      .transformWithState(new SpaceSavingProcessor(capacity),
        TimeMode.None(), OutputMode.Append())
    val drained = withRocksDb(spark) {
      runDatasetToMemory(spark, summary, "heavy_hitters_stream", OutputMode.Append())
        .toDF("shard", "seq", "item", "est", "err")
    }
    // per shard, the last emitted summary supersedes earlier batches'
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
    drained.withColumn("mx", max(col("seq")).over(w))
      .filter(col("seq") === col("mx"))
      .select(col("item"), col("est"), col("err"))
  }

  /** Streaming insert-if-absent sink: each micro-batch goes through the
    * same anti-join upsert as the batch pipeline (A8), making the sink
    * idempotent — exactly-once results even when a batch replays after a
    * checkpoint recovery. This is the foreachBatch pattern the Tier-B
    * "Sinks" row calls for. Blocks until the AvailableNow backlog drains. */
  def upsertSink(stream: DataFrame, tablePath: String, keys: Seq[String],
      checkpointDir: String): Unit = {
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Upsert.intoParquet(batch.sparkSession, batch, tablePath, keys)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
