package graft.operators

import graft.CacheLifecycle.TrackedPersistOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact equi-depth histogram with ties-kept-together bucket assignment.
  *
  * Depth-balanced buckets need each value's global cumulative row count —
  * a prefix sum over the sorted value domain. The naive form (one
  * unpartitioned window over every distinct value) serializes onto a
  * single task; at sf0.1 the near-unique price domain made that window the
  * whole query cost. This operator runs the classic two-phase distributed
  * scan instead:
  *
  *  1. reduce rows to (value, count) groups — the only full-data shuffle;
  *  2. slice the value domain into `slices` fixed-width ranges (floor of a
  *     monotone affine map, so slice order == value order regardless of
  *     floating-point rounding);
  *  3. local prefix sums within each slice (windows partitioned by slice —
  *     parallel, no single-task scan);
  *  4. per-slice totals (≤ `slices` rows) get their own tiny prefix sum,
  *     and each slice's exclusive offset is broadcast-joined back;
  *  5. global cum = slice offset + local cum; bucket = ceil(cum·B/N) in
  *     pure integer arithmetic.
  *
  * Equal values always share a bucket (assignment happens on value groups),
  * which is what makes the result deterministic on any engine. The output
  * is identical to the naive single-window form — the DuckDB oracle states
  * that simple form, this plan just computes it scalably.
  */
object EquiDepth {

  /** Per-bucket stats (bucket, n_rows, min_v, max_v, sum_v) for `buckets`
    * depth-balanced buckets over a 2-decimal money column. */
  def histogram(df: DataFrame, valueCol: Column, buckets: Int = 10,
      slices: Int = 64): DataFrame = {
    // One full-data scan+reduction, read by three branches (bounds, local
    // prefix sums, slice totals). Without the persist each branch re-runs
    // the scan+groupBy — the plan showed 4 identical scans (exchange reuse
    // does not fire across the broadcast nesting); with it the query cost
    // collapses to the single reduction. LRU-evicted, no caller lifecycle
    // (the Dedup.shingleHashRows convention).
    // NULL values have no rank position in an ordered domain and are
    // excluded up front. (Leaving them in was worse than a semantic choice:
    // the NULL group's slice is NULL, the using-column join drops it, and
    // the rows vanished from the output while still inflating N — every
    // bucket boundary shifted.)
    val byVal = df.where(valueCol.isNotNull)
      .groupBy(valueCol.as("v")).agg(count(lit(1)).as("c")).persistTracked()
    val bounds = byVal.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    // monotone slice id: equal lo/hi (degenerate domain) collapses to slice 0
    val sliced = byVal.crossJoin(broadcast(bounds))
      .withColumn("slice",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / slices)),
            lit(slices - 1)).cast("int")))
    val wLocal = Window.partitionBy(col("slice")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = sliced.withColumn("lc", sum(col("c")).over(wLocal))
    // per-slice totals: ≤ `slices` rows — their prefix sum is trivially tiny
    val wSlices = Window.orderBy(col("slice")).rowsBetween(Window.unboundedPreceding, 0)
    val offsets = sliced.groupBy(col("slice")).agg(sum(col("c")).as("st"))
      .withColumn("off", sum(col("st")).over(wSlices) - col("st"))
      .withColumn("n", sum(col("st")).over(
        Window.partitionBy(lit(1)).rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("slice"), col("off"), col("n"))
    local.join(broadcast(offsets), "slice")
      .withColumn("cum", col("off") + col("lc"))
      .withColumn("bucket", expr(s"(cum * $buckets + n - 1) div n"))
      .groupBy(col("bucket"))
      .agg(sum(col("c")).as("n_rows"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        sum(col("v").cast("decimal(14,2)") * col("c")).cast("double").as("sum_v"))
  }
}
