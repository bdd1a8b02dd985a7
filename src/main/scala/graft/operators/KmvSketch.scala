package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch — the mergeable distinct-count
  * summary that, unlike HLL registers, supports SET OPERATIONS: keeping
  * the k smallest distinct hash values of a set lets union (merge + trim),
  * intersection, and Jaccard be estimated from sketch contents alone
  * (Bar-Yossef et al. 2002; Beyer et al. 2007 "Distinct-Value Synopses").
  * This is the audience-overlap primitive at 100 TB: per-segment sketches
  * are built in one pass (map-side partial k-min merge — the shuffle
  * carries ≤k longs per group, never user ids), stored, and every pairwise
  * overlap question is answered from the stored sketches.
  *
  * Determinism: the sketch of a set under a FIXED hash is exactly its k
  * smallest distinct hash values — independent of row order, partitioning,
  * and merge tree — so estimates are bit-reproducible and a SQL oracle can
  * restate them verbatim (the repo's 56-bit md5 uniform convention).
  * Estimator (exact integer arithmetic, M = 2^56 the hash domain):
  * distinct ≈ (k−1)·M div h_(k) when the sketch is full; a sketch smaller
  * than k IS the whole distinct hash set, served exactly. */
object KmvSketch {

  /** Finished sketch as data: the k smallest distinct hashes, ascending. */
  final case class Kmv(mins: Array[Long])

  /** Aggregation buffer: current k-min candidates, unsorted with possible
    * duplicates between flushes; compacted (sort + dedup + trim to k)
    * whenever the scratch space fills. Kryo-encoded. */
  final class Buf(var items: Array[Long], var size: Int, val k: Int)
    extends Serializable

  private def compact(b: Buf): Unit = {
    val sorted = java.util.Arrays.copyOf(b.items, b.size)
    java.util.Arrays.sort(sorted)
    var w = 0
    var i = 0
    while (i < sorted.length && w < b.k) {
      if (w == 0 || sorted(i) != b.items(w - 1)) { b.items(w) = sorted(i); w += 1 }
      i += 1
    }
    b.size = w
  }

  /** Column aggregator: 64-bit hash column → [[Kmv]]. Register via
    * `functions.udaf(new KmvSketch.Agg(k), Encoders.scalaLong)`. */
  final class Agg(k: Int) extends Aggregator[Long, Buf, Kmv] {
    require(k >= 2, s"sketch size k must be >= 2: $k")
    def zero: Buf = new Buf(new Array[Long](2 * k), 0, k)
    def reduce(b: Buf, h: Long): Buf = {
      // right after a compaction the buffer is sorted-distinct: anything
      // at or past a full sketch's k-th min can never enter — reject
      // before it costs scratch space
      if (b.size == b.k && h >= b.items(b.k - 1)) return b
      if (b.size == b.items.length) compact(b)
      if (!(b.size == b.k && h >= b.items(b.k - 1)))
        { b.items(b.size) = h; b.size += 1 }
      b
    }
    def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < b.size) { reduce(a, b.items(i)); i += 1 }
      a
    }
    def finish(b: Buf): Kmv = {
      compact(b)
      Kmv(java.util.Arrays.copyOf(b.items, b.size))
    }
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Kmv] = Encoders.product[Kmv]
  }
}
