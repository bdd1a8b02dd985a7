package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter join pruning: the 100 TB pattern for a selective semi join
  * whose build side is too large to broadcast as a hash relation but whose
  * KEY SET compresses into a few MB of bloom bits.
  *
  * [[bloomSemiJoin]] plans a `BloomFilterAggregate` over the small side's
  * hashed keys as a scalar subquery and probes it with the codegen'd
  * `BloomFilterMightContain` expression — exactly the pair Spark's own
  * `InjectRuntimeFilter` rule emits for the shapes it recognizes. The
  * explicit operator covers the rest (and documents the technique). The
  * bloom build runs as a distributed partial+final aggregation inside the
  * same query (no eager driver-side scan), the probe stays inside
  * whole-stage codegen (no ScalaUDF), and the pruned rows are stripped of
  * false positives by an exact semi join — the result is provably identical
  * to the plain semi join (bloom filters have no false negatives), which
  * keeps the operator oracle-checkable. The win at scale: the join shuffle
  * moves `fpp + selectivity` of the large side instead of all of it.
  *
  * Keys of any type are supported: both sides probe on `xxhash64(key)`,
  * which is what `BloomFilterAggregate` ingests.
  */
object BloomPrune {

  /** Large side pre-filtered through the bloom bits only — still contains
    * ~`fpp` false positives. Exposed for tests that measure pruning rate.
    *
    * @param expectedItems sizing for the bloom filter (small-side distinct
    *                      keys); overshooting only costs bits
    * @param fpp           false-positive rate: fraction of non-matching
    *                      large-side rows that survive to the exact join
    */
  def bloomPruned(large: DataFrame, small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // Optimal bits for n items at false-positive rate p: -n·ln(p)/ln(2)².
    // BloomFilterAggregate silently clamps its inputs to the session's
    // runtime-filter caps; beyond them the filter would be undersized and
    // the real false-positive rate climbs above the requested fpp with no
    // signal. Clamp explicitly and WARN, so a 100 TB caller sizing for
    // billions of keys learns to raise the conf instead of silently
    // shipping an over-admitting filter. Results stay exact either way —
    // the semi join downstream strips every false positive.
    val wanted = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val maxBits = large.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    if (wanted > maxBits)
      System.err.println(s"[graft] WARN bloom sizing clamped: $wanted bits optimal " +
        s"for $expectedItems items at fpp=$fpp, conf caps at $maxBits — " +
        "effective fpp will be higher; raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    val numBits = math.min(wanted, maxBits)
    val smallPlan = small.queryExecution.analyzed
    val buildKey = smallPlan.output.find(_.name == key).getOrElse(
      throw new IllegalArgumentException(s"column $key not in small side"))
    val bloomAgg = Aggregate(Nil,
      Seq(Alias(new BloomFilterAggregate(new XxHash64(Seq(buildKey)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression(), "bloom_bits")()),
      smallPlan)
    val probe = org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      ScalarSubquery(bloomAgg),
      ColumnBridge.expression(xxhash64(large(key))))
    large.filter(large(key).isNotNull && ColumnBridge.column(probe))
  }

  /** Exact semi join of `large` on `small`'s `key`, bloom-pruned. */
  def bloomSemiJoin(large: DataFrame, small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    bloomPruned(large, small, key, expectedItems, fpp)
      .join(small.select(small(key)).distinct(), Seq(key), "left_semi")
}
