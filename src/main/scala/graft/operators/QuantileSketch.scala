package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable deterministic quantile sketch for UNBOUNDED value domains —
  * the percentile partial q276's integer-grid histogram cannot be: revenue,
  * latency-µs, any open-ended double column. A Munro-Paterson / KLL-shaped
  * level compactor (Munro & Paterson 1980; Karnin-Lang-Liberty 2016 is the
  * randomized refinement) with one deliberate change: compaction is
  * DETERMINISTIC (always keep the even-indexed elements of the sorted
  * buffer), and every compaction's worst-case rank displacement is
  * accumulated ONLINE into the sketch's own `err` field. The price is the
  * weaker deterministic bound (err grows ~(n/k)·log(n/k) instead of the
  * randomized sketch's concentration), the payoff is a PROVEN, per-instance
  * bound valid for ANY merge order — which is what makes the sketch
  * oracle-gateable: a query can return the exact percentile for the hash
  * compare plus a boolean certifying the sketch estimate's true rank lies
  * within [target − err, target + err] (the q87 self-check shape, with the
  * sketch's own tracked bound in place of an assumed ε·N).
  *
  * Structure: level i holds at most k values, each standing for 2^i input
  * items. When a level overflows, its sorted buffer y_1..y_{2m} (weight w)
  * collapses to y_2, y_4, ..., y_{2m} (weight 2w) — the estimated rank
  * R̂(x) = Σ{w_j : v_j ≤ x} of ANY query point x moves by at most w, so
  * |R̂(x) − rank(x)| ≤ Σ w_over_all_compactions = err, and errors are
  * additive across merges. Size: O(k · log(n/k)) values per sketch; both
  * reduce and merge are map-side — the corpus-sized shuffle carries
  * sketches, never rows, exactly how a 100 TB engine serves percentile
  * rollups over open-ended domains without re-touching data.
  *
  * Sizing: the deterministic bound grows as err ≈ (n/k)·log2(n/k) —
  * about n/k displacement per level, one level per doubling — so the
  * RELATIVE bound is ≈ log2(n/k)/k and k must be sized logarithmically
  * in n for a target ε (the MRL k = O((1/ε)·log²(εn)) rule): k=64 holds
  * ~14% of rank at n=3·10^4, k=4096 holds ~0.7% at n=10^12. The sketch
  * never pretends otherwise — err is carried in the result and the q308
  * gate certifies against the TRACKED value, not an assumed ε.
  */
object QuantileSketch {

  /** Finished sketch as data: parallel (value, weight) arrays sorted by
    * value, the accumulated worst-case rank-error bound, and the exact
    * item count. This struct is itself RE-AGGREGABLE (see [[MergeAgg]]) —
    * a stored fine-level sketch table serves every coarser rollup level. */
  final case class Sketch(values: Array[Double], weights: Array[Long],
      err: Long, n: Long)

  /** Mutable level-buffer state while aggregating (kryo-encoded). */
  final class Buf(var levels: Array[ArrayBuffer[Double]], var err: Long,
      var n: Long) extends Serializable

  private def emptyBuf(): Buf = new Buf(Array(ArrayBuffer.empty[Double]), 0L, 0L)

  /** Collapse level i's sorted buffer to its even-indexed half, pushing
    * into level i+1. Keeps ALL of level i when its size is odd by leaving
    * one element behind (compaction consumes an even prefix count) —
    * simpler: compact only when size ≥ 2 (pairs), leaving a possible odd
    * straggler in place. err grows by the level's weight per compaction. */
  private def compactLevel(b: Buf, i: Int, k: Int): Unit = {
    val buf = b.levels(i)
    if (buf.size < 2) return
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    val pairs = sorted.length / 2
    val promoted = new Array[Double](pairs)
    var t = 0
    while (t < pairs) { promoted(t) = sorted(2 * t + 1); t += 1 } // even-indexed (1-based)
    buf.clear()
    if (sorted.length % 2 == 1) buf += sorted(sorted.length - 1) // straggler stays
    if (i + 1 >= b.levels.length)
      b.levels = b.levels :+ ArrayBuffer.empty[Double]
    b.levels(i + 1) ++= promoted
    b.err += (1L << i) // rank displacement ≤ level weight, once per compaction
    if (b.levels(i + 1).size >= k) compactLevel(b, i + 1, k)
  }

  private def addOne(b: Buf, v: Double, k: Int): Buf = {
    b.levels(0) += v
    b.n += 1
    if (b.levels(0).size >= k) compactLevel(b, 0, k)
    b
  }

  private def mergeBufs(a: Buf, b: Buf, k: Int): Buf = {
    if (b.levels.length > a.levels.length) return mergeBufs(b, a, k)
    var i = 0
    while (i < b.levels.length) { a.levels(i) ++= b.levels(i); i += 1 }
    a.err += b.err
    a.n += b.n
    i = 0
    while (i < a.levels.length) { // cascade any overflow bottom-up
      if (a.levels(i).size >= k) compactLevel(a, i, k)
      i += 1
    }
    a
  }

  private def finishBuf(b: Buf): Sketch = {
    val entries = b.levels.iterator.zipWithIndex.flatMap { case (buf, i) =>
      buf.iterator.map(v => (v, 1L << i))
    }.toArray.sortBy(_._1)
    Sketch(entries.map(_._1), entries.map(_._2), b.err, b.n)
  }

  /** Restore level structure from a stored sketch (weights are powers of
    * two by construction, so each entry re-enters its own level). */
  private def fromSketch(s: Sketch, k: Int): Buf = {
    val b = emptyBuf()
    var i = 0
    while (i < s.values.length) {
      val lvl = java.lang.Long.numberOfTrailingZeros(s.weights(i))
      while (b.levels.length <= lvl)
        b.levels = b.levels :+ ArrayBuffer.empty[Double]
      b.levels(lvl) += s.values(i)
      i += 1
    }
    b.err = s.err
    b.n = s.n
    var j = 0
    while (j < b.levels.length) {
      if (b.levels(j).size >= k) compactLevel(b, j, k)
      j += 1
    }
    b
  }

  /** Column aggregator: double column → sketch struct. Register with
    * `functions.udaf(new QuantileSketch.SketchAgg(k), Encoders.scalaDouble)`. */
  final class SketchAgg(k: Int) extends Aggregator[Double, Buf, Sketch] {
    require(k >= 4, s"compactor width k must be >= 4: $k")
    def zero: Buf = emptyBuf()
    def reduce(b: Buf, v: Double): Buf = addOne(b, v, k)
    def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b, k)
    def finish(b: Buf): Sketch = finishBuf(b)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  /** Sketch-of-sketches aggregator: merges FINISHED sketch structs — the
    * rollup-level path (fine sketches per dimension cell, coarser levels
    * from the fine table, never from raw rows). The merged bound is the
    * sum of the parts' bounds plus any new compactions' displacement —
    * still a valid certificate for any merge order. */
  final class MergeAgg(k: Int) extends Aggregator[Sketch, Buf, Sketch] {
    require(k >= 4, s"compactor width k must be >= 4: $k")
    def zero: Buf = emptyBuf()
    def reduce(b: Buf, s: Sketch): Buf = mergeBufs(b, fromSketch(s, k), k)
    def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b, k)
    def finish(b: Buf): Sketch = finishBuf(b)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }
}
