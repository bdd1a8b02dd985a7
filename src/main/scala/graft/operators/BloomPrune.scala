package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: the 100 TB pattern for a selective semi join
  * whose build side is too large to broadcast as a hash relation but whose
  * KEY SET compresses into a few MB of bloom bits.
  *
  * [[bloomSemiJoin]] builds a bloom filter over the small side's keys
  * (`DataFrameStatFunctions.bloomFilter` — one pass, mergeable sketches),
  * broadcasts it, prunes the large side BEFORE the join shuffle, then runs
  * the exact semi join to strip the false positives. The result is provably
  * identical to the plain semi join (bloom filters have no false
  * negatives), which keeps the operator oracle-checkable; the win is that
  * the shuffle moves `fpp + selectivity` of the large side instead of all
  * of it. Spark's own runtime-filter injection does this automatically for
  * some shapes; the explicit operator covers the rest (and documents the
  * technique).
  *
  * The pre-filter is a deterministic UDF over broadcast bits — off the
  * codegen path, but one primitive hash probe per row against in-memory
  * bits is far cheaper than shuffling the pruned rows would be.
  */
object BloomPrune {

  /** Exact semi join of `large` on `small`'s `key`, bloom-pruned.
    * Long-typed keys (the join-key norm in this schema).
    *
    * @param expectedItems sizing for the bloom filter (small-side distinct
    *                      keys); overshooting only costs bits
    * @param fpp           false-positive rate: fraction of non-matching
    *                      large-side rows that survive to the exact join
    */
  def bloomSemiJoin(large: DataFrame, small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val bcast = large.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bcast.value.mightContainLong(k))
    large.filter(col(key).isNotNull && mightContain(col(key)))
      .join(small.select(col(key)).distinct(), Seq(key), "left_semi")
  }
}
