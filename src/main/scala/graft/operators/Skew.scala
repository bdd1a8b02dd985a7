package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one entity owning a large fraction of rows — the classic hot user /
  * hot order case at 100 TB).
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin, on by default)
  * covers sort-merge joins at runtime; explicit salting remains the tool
  * when the build side must be replicated deterministically — e.g. a
  * skewed fact ⋈ dimension join where one dimension key dominates.
  *
  * [[saltedJoin]] splits each hot key into `saltFactor` sub-keys: the
  * large side salts by hash(row-unique column) % saltFactor, the small
  * side replicates every row saltFactor times. Results are identical to
  * the plain join; the shuffle partitions carrying the hot key shrink by
  * the salt factor.
  */
object Skew {

  /** Inner equi-join of `large` and `small` on `key`, salted.
    *
    * @param uniqueCol a column of `large` that varies within a key (used
    *                  to spread rows deterministically across salts)
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      uniqueCol: String, saltFactor: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(col(uniqueCol)), lit(saltFactor.toLong)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
