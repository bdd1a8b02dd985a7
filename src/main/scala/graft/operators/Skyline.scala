package graft.operators

import graft.CacheLifecycle.TrackedPersistOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 2-D skyline (Pareto front) — an operator relational engines rarely ship
  * natively (Börzsönyi, Kossmann & Stocker 2001, "The Skyline Operator",
  * ICDE): keep the points no other point dominates, minimizing `x` and
  * maximizing `y`. q dominates p iff q.x ≤ p.x ∧ q.y ≥ p.y with at least
  * one strict.
  *
  * The naive form is an O(n²) dominance anti-join (the oracle states it);
  * the sorted form needs a prefix max over the x-ordered domain — which, as
  * a single unpartitioned window, serializes onto one task (the q132
  * lesson). This operator computes the prefix max with the same two-phase
  * distributed scan [[EquiDepth]] uses for its prefix SUM:
  *
  *  1. reduce rows to (x, y) groups, then per-x bests (the only full-data
  *     shuffles, both key-bounded);
  *  2. slice the x domain into fixed-width ranges (monotone affine map —
  *     slice order == x order);
  *  3. slice-local strictly-preceding running max (windows partitioned by
  *     slice — parallel);
  *  4. per-slice maxima (≤ `slices` rows) get their own tiny exclusive
  *     prefix max, broadcast back;
  *  5. survive iff y > max(local prev, slice offset) — strictly, because a
  *     point with smaller x and equal y dominates — and, within an x
  *     group, iff y equals the group max (same x, larger y dominates).
  *     Duplicate (x, y) points tie and all survive (neither dominates).
  */
object Skyline {

  /** Surviving (x, y, n_rows) groups of the min-x/max-y skyline. */
  def skyline2D(df: DataFrame, xCol: Column, yCol: Column,
      slices: Int = 64): DataFrame = {
    // NULLs have no place in a dominance order — excluded up front (the
    // EquiDepth convention). Persisted: read by the per-x reduction and
    // the final count join-back.
    val pts = df.where(xCol.isNotNull && yCol.isNotNull)
      .groupBy(xCol.as("x"), yCol.as("y")).agg(count(lit(1)).as("n_rows"))
      .persistTracked()
    val gx = pts.groupBy(col("x")).agg(max(col("y")).as("gmax"))
    val bounds = gx.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val sliced = gx.crossJoin(broadcast(bounds))
      .withColumn("slice",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / slices)),
            lit(slices - 1)).cast("int")))
    val wLocal = Window.partitionBy(col("slice")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sliced.withColumn("lmax", max(col("gmax")).over(wLocal))
    // exclusive prefix max over ≤ `slices` slice maxima — trivially tiny
    val wSlices = Window.orderBy(col("slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliced.groupBy(col("slice")).agg(max(col("gmax")).as("smax"))
      .withColumn("soff", max(col("smax")).over(wSlices))
      .select(col("slice"), col("soff"))
    // greatest() skips NULLs: first group of the first slice has no
    // predecessor at all → mprev NULL → survives unconditionally
    val surv = local.join(broadcast(offsets), "slice")
      .withColumn("mprev", greatest(col("lmax"), col("soff")))
      .filter(col("mprev").isNull || col("gmax") > col("mprev"))
      .select(col("x"), col("gmax").as("y"))
    pts.join(surv, Seq("x", "y"))
      .select(col("x"), col("y"), col("n_rows"))
  }
}
