package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers that make Spark results bit-identical to the DuckDB oracle.
  *
  * Double summation is order-dependent and Spark's partial/final aggregation
  * order differs from DuckDB's, so every SUM/AVG of doubles is routed through
  * exact DECIMAL arithmetic (deterministic in both engines), then cast back
  * to DOUBLE for a stable output schema. Per-row double arithmetic
  * (`a * (1 - b)`) is IEEE-deterministic and needs no special handling; the
  * testdata's money-like columns hold exact 2-decimal values, so the decimal
  * casts are lossless. Products of 2-decimal values are computed entirely in
  * decimal (money * oneMinus(...)): casting the double product instead would
  * hit true decimal ties (x.xxxx50) where Spark (exact-expansion HALF_UP)
  * and DuckDB (double-multiply + llround) can disagree.
  *
  * Oracle-side equivalents used in the SQL strings:
  *   money(x)    == CAST(x AS DECIMAL(14,2))
  *   frac(x)     == CAST(x AS DECIMAL(5,2))
  *   oneMinus(x) == CAST(1.0 - x AS DECIMAL(5,2))
  *   onePlus(x)  == CAST(1.0 + x AS DECIMAL(5,2))
  *   dsum(x)     == CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
  *   dsum4(x)    == CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
  *   davg(x)     == CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
  *
  * Further conventions proven out across the packs:
  *  - Oracle integer SUMs (plain and windowed) must be CAST to BIGINT —
  *    DuckDB widens to HUGEINT, which lands as float64 in the driver's
  *    compare and kind-mismatches Spark's int64 (int32-vs-int64 width
  *    diffs are tolerated, kind diffs are not).
  *  - Sketch estimates that cannot match across engines (HLL, GK
  *    percentile) hash the EXACT value plus a theorem-backed within-bound
  *    boolean (q63/q87) instead of the estimate.
  *  - Oracle CTEs referenced inside recursive CTEs need AS MATERIALIZED or
  *    DuckDB re-evaluates them every iteration (q82).
  *  - Ratios of small integers (jaccard, rank fractions) are IEEE-exact in
  *    both engines and need no decimal routing or rounding.
  *  - Never ROUND a quotient whose numerator lives on a decimal grid: a
  *    1e-4-grid sum divided by an integer count lands EXACTLY on round-4
  *    half-way ties, and Spark and DuckDB break ties differently (observed
  *    live in q39 at sf0.1). Compute such means in integer grid units
  *    (sum of value*1e4 longs, integer division, one exact double divide).
  */
object Q {
  /** Exact decimal view of a 2-decimal money column. */
  def money(c: Column): Column = c.cast("decimal(14,2)")

  /** Exact decimal view of a small 2-decimal fraction (discount/tax). */
  def frac(c: Column): Column = c.cast("decimal(5,2)")

  /** (1 - x) as exact decimal; x is a 2-decimal fraction. */
  def oneMinus(c: Column): Column = (lit(1.0) - c).cast("decimal(5,2)")

  /** (1 + x) as exact decimal; x is a 2-decimal fraction. */
  def onePlus(c: Column): Column = (lit(1.0) + c).cast("decimal(5,2)")

  /** Exact sum of a 2-decimal double column. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Sum of an arbitrary (non-2-decimal) double column: 4-decimal snap for
    * exact cross-engine summation, then a 2-decimal round of the total.
    * The snap alone is not safe for arbitrary doubles — Spark rounds the
    * exact binary expansion while DuckDB multiplies by 1e4 and llrounds,
    * and for magnitudes ~1e5 they disagree on ~1 value in 3e6 (observed
    * live in the centroid query at sf0.1). The final round gives ~50x
    * margin over a single-flip error (1e-4 vs the 0.005 grid).
    * Oracle form: ROUND(CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE), 2) */
  def dsum4(c: Column): Column =
    round(sum(c.cast("decimal(18,4)")).cast("double"), 2)

  /** Deterministic average: exact decimal sum, one double division. */
  def davg(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(lit(1))
}
