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

  /** Skew-safe unordered-pair generation within buckets — the exact fix for
    * the oversized-LSH-bucket hazard (boilerplate documents colliding into
    * one band bucket would put that bucket's O(B²) pair work on ONE reducer
    * in a naive bucket self-join).
    *
    * Fragment-replicate scheme: rows are chunked inside each bucket
    * (row_number order by id, `chunkSize` rows per chunk); the left side
    * replicates each row to every chunk-pair cell (own, t >= own), the
    * right side to (s <= own, own), and the join key becomes
    * (bucket, cl, cr) — so each shuffle key carries at most chunkSize²
    * candidate work regardless of bucket size. Chunking by id order makes
    * cross-chunk pairs come out id-ordered for free; only the diagonal
    * cells need the id_a < id_b filter, and every pair is produced exactly
    * once (no distinct needed). Replication overhead is ~B/chunkSize rows
    * per side — 1/chunkSize of the inherent pair work, not a blowup.
    *
    * Returns (id_a, id_b) with id_a < id_b, identical to the naive
    * per-bucket self-join (SurfaceSpec proves equality on a pathological
    * bucket).
    */
  /** Hybrid bucket self-join: unordered pairs (id_a < id_b) within each
    * bucket, with per-bucket routing — buckets up to `maxBucketRows` go
    * through the plain self-join (no overhead, the overwhelmingly common
    * case), larger ones through [[skewSafeBucketPairs]] so one boilerplate
    * bucket can't put O(B²) pair work on a single reducer. This is the
    * integration point the LSH band joins (minhash near-dup, cosine-LSH)
    * call; output is identical to the naive self-join either way, so the
    * callers' oracle checks are unaffected.
    *
    * The routing needs per-bucket counts — a window COUNT over the bucket
    * keys (the exact shuffle the self-join needs anyway, no extra
    * aggregate-join pass). The sized rows are persisted: three consumers
    * (both self-join sides and the skew branch) would otherwise each
    * recompute the upstream lineage. Cheap insurance at 100 TB.
    *
    * `eagerProbe` trades laziness for plan size: when true, one Spark job
    * runs at CONSTRUCTION time to test whether any bucket is hot, and the
    * fragment-replicate branch is omitted entirely when none is — several
    * cache passes and empty shuffles saved on every later execution.
    * Default false preserves the DataFrame contract (composing this
    * operator, or .explain(), must not execute the upstream pipeline);
    * set it only where the result is executed immediately after
    * construction, e.g. a query evaluated once per invocation.
    */
  def hybridBucketPairs(rows: DataFrame, bucketCols: Seq[String],
      idCol: String, maxBucketRows: Int = 4096, chunkSize: Int = 1024,
      eagerProbe: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBucket = Window.partitionBy(bucketCols.map(col): _*)
    val keyed = rows
      .withColumn("__bn", count(lit(1)).over(byBucket))
      .persist()
    val smallSide = keyed.filter(col("__bn") <= maxBucketRows).drop("__bn")
    val bigSide = keyed.filter(col("__bn") > maxBucketRows).drop("__bn")
    val naive = smallSide.as("a")
      .join(smallSide.as("b"),
        bucketCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    // Lazy default: union the fragment-replicate branch unconditionally —
    // when no bucket is hot it runs over zero rows (empty-partition stages
    // plus a few passes over the persisted rows, paid at EXECUTION time,
    // measured ~2-3s at sf0.1). Eager opt-in: probe emptiness now — one
    // job over the freshly persisted rows (work the naive join was about
    // to do anyway, warming the cache it reads) — and skip the branch for
    // good in the overwhelmingly common all-cold case.
    if (eagerProbe && bigSide.isEmpty) naive
    else naive.unionByName(skewSafeBucketPairs(bigSide, bucketCols, idCol, chunkSize))
  }

  def skewSafeBucketPairs(rows: DataFrame, bucketCols: Seq[String],
      idCol: String, chunkSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBucket = Window.partitionBy(bucketCols.map(col): _*)
    val withChunk = rows
      .withColumn("__rn", row_number().over(byBucket.orderBy(col(idCol))))
      .withColumn("__chunk", ((col("__rn") - 1) / chunkSize).cast("int"))
    val maxChunk = withChunk
      .groupBy(bucketCols.map(col): _*)
      .agg(max(col("__chunk")).as("__maxc"))
    val keyed = withChunk.join(maxChunk, bucketCols)
    val left = keyed
      .withColumn("__cr", explode(sequence(col("__chunk"), col("__maxc"))))
      .select((bucketCols.map(col) :+ col("__chunk").as("__cl") :+ col("__cr") :+
        col(idCol).as("id_a")): _*)
    val right = keyed
      .withColumn("__cl", explode(sequence(lit(0), col("__chunk"))))
      .select((bucketCols.map(col) :+ col("__cl") :+ col("__chunk").as("__cr") :+
        col(idCol).as("id_b")): _*)
    left.join(right, bucketCols ++ Seq("__cl", "__cr"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
  }
}
