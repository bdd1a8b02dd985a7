package graft.operators

import graft.CacheLifecycle.TrackedPersistOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one entity owning a large fraction of rows — the classic hot user /
  * hot order case at 100 TB).
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin, on by default)
  * covers sort-merge joins at runtime; explicit routing remains the tool
  * when a single join KEY is hot — AQE splits oversized partitions, but a
  * partition holding one giant key cannot be split without replicating the
  * other side, which is exactly what the operators here do deterministically.
  *
  * Three tools:
  *  - [[saltedJoin]]: classic salting for a skewed fact ⋈ small dimension.
  *  - [[hybridBucketPairs]]: within-bucket unordered PAIRS (self-join),
  *    threshold-routed — the LSH-band / prefix-filter candidate generator.
  *  - [[hybridBucketJoin]]: two-sided bucket equi-join, threshold-routed —
  *    the probe-prefix ⋈ posting-list shape (containment join).
  *
  * Per-bucket sizes for the routing come from a window COUNT over the
  * bucket keys, NOT a separate aggregate-join pass — deliberately: the
  * window's exchange hash-partitions the persisted rows on exactly the
  * bucket keys the candidate join needs, so the join downstream of the
  * cache needs NO further exchange (Catalyst sees the InMemoryRelation's
  * outputPartitioning satisfy the join's distribution). One shuffle does
  * double duty: routing sizes + join co-location. An aggregate+broadcast
  * probe was prototyped and measured SLOWER at sf0.1 (q45 1.4→1.8 s,
  * q56 1.0→1.5 s): it leaves the cache partitioned by input order, so the
  * self-join pays two fresh full-data exchanges that the window form
  * amortizes into its one.
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

  /** ceil(cnt / chunkSize) as an int column (exact: counts ≪ 2^53). */
  private[operators] def nChunks(cnt: Column, chunkSize: Int): Column =
    floor((cnt + lit(chunkSize - 1)) / lit(chunkSize)).cast("int")

  /** Plain within-bucket self-join: (id_a, id_b) with id_a < id_b, plus
    * `${p}_a`/`${p}_b` for each payload column. */
  private[operators] def plainPairs(part: DataFrame, bucketCols: Seq[String],
      idCol: String, payload: Seq[String]): DataFrame =
    part.as("a").join(part.as("b"),
        bucketCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(Seq(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b")) ++
        payload.flatMap(p =>
          Seq(col(s"a.$p").as(s"${p}_a"), col(s"b.$p").as(s"${p}_b"))): _*)

  /** Fragment-replicate pairs for HOT buckets: rows arrive with `ncCol` =
    * ceil(bucketSize/chunkSize); each row is hash-assigned a chunk and the
    * sides replicate triangularly — left to cells (own, t ≥ own), right to
    * (s ≤ own, own) — so the join key (bucket, __cl, __cr) carries at most
    * ~chunkSize² candidate work regardless of bucket size. Every unordered
    * pair meets in exactly ONE cell: diagonal cells see both orderings
    * (only they need the a < b filter), off-diagonal pairs appear once and
    * are canonicalized with least/greatest over an id-led struct (ids are
    * unique within a bucket, so struct order ≡ id order and the payload
    * swaps with its id). Replication overhead is ~nc rows per input row —
    * 1/chunkSize of the inherent pair work, not a blowup.
    *
    * Hash chunking (pmod(xxhash64(id), nc)) replaces the earlier
    * row_number scheme: no per-bucket sort, no max-chunk aggregate join —
    * chunk populations are binomial around chunkSize, which only moves the
    * per-cell cap by small constant factors. */
  private[operators] def fragmentPairs(hotRows: DataFrame, bucketCols: Seq[String],
      idCol: String, payload: Seq[String], ncCol: String): DataFrame = {
    val chunked = hotRows.withColumn("__chunk",
      pmod(xxhash64(col(idCol)), col(ncCol).cast("long")).cast("int"))
    val left = chunked
      .withColumn("__cr", explode(sequence(col("__chunk"), col(ncCol) - 1)))
      .select(bucketCols.map(col) ++ Seq(col("__chunk").as("__cl"), col("__cr"),
        col(idCol).as("__ia")) ++ payload.map(p => col(p).as(s"__a_$p")): _*)
    val right = chunked
      .withColumn("__cl", explode(sequence(lit(0), col("__chunk"))))
      .select(bucketCols.map(col) ++ Seq(col("__cl"), col("__chunk").as("__cr"),
        col(idCol).as("__ib")) ++ payload.map(p => col(p).as(s"__b_$p")): _*)
    // Off-diagonal pairs appear once with UNKNOWN id order, so every output
    // column is a conditional swap on the id comparison — plain codegen
    // compare-and-select per pair. (A least/greatest-over-structs
    // canonicalization was measured ~2x SLOWER END TO END on a 60%-hot
    // 450M-pair bucket: struct ordering per emitted pair is interpreted
    // row-comparator work, and it multiplied across the 2+2·|payload|
    // output columns.)
    //
    // The cell join is repartitioned EXPLICITLY (REPARTITION_BY_NUM — AQE
    // never coalesces a user-numbered exchange) because the shuffle READ
    // here is tiny (~nc rows per input row) while the join OUTPUT fans out
    // ~chunkSize× per row: AQE's advisory-size coalescing sees only the
    // read side and would pack the whole pair-emission onto 1-2 cores.
    val keys = bucketCols ++ Seq("__cl", "__cr")
    val n = hotRows.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val swap = col("__ib") < col("__ia")
    left.repartition(n, keys.map(col): _*)
      .join(right.repartition(n, keys.map(col): _*), keys)
      .filter(col("__cl") =!= col("__cr") || col("__ia") < col("__ib"))
      .select(Seq(
        when(swap, col("__ib")).otherwise(col("__ia")).as("id_a"),
        when(swap, col("__ia")).otherwise(col("__ib")).as("id_b")) ++
        payload.flatMap(p => Seq(
          when(swap, col(s"__b_$p")).otherwise(col(s"__a_$p")).as(s"${p}_a"),
          when(swap, col(s"__a_$p")).otherwise(col(s"__b_$p")).as(s"${p}_b"))): _*)
  }

  /** Hybrid bucket self-join: unordered pairs (id_a < id_b) within each
    * bucket, with per-bucket routing — buckets up to `maxBucketRows` go
    * through the plain self-join (no overhead, the overwhelmingly common
    * case), larger ones through [[fragmentPairs]] so one boilerplate bucket
    * can't put O(B²) pair work on a single reducer. This is the integration
    * point for every candidate-pair generator (minhash band join,
    * cosine-LSH band join, prefix-filter self-join); output is identical to
    * the naive self-join either way, so callers' oracle checks are
    * unaffected.
    *
    * `payload` columns ride along both sides (output `${p}_a`/`${p}_b`) so
    * callers can apply pair predicates (e.g. the PPJoin size band) without
    * re-joining per-id attributes.
    *
    * The size-annotated rows are persisted (LRU-evicted, no caller
    * lifecycle): up to three consumers read them, and the cache holds them
    * PARTITIONED BY THE BUCKET KEYS (see the object scaladoc) so the joins
    * need no further exchange.
    *
    * `eagerProbe` trades laziness for plan size: when true, one Spark job
    * runs at CONSTRUCTION time to test whether any bucket is hot, and when
    * none is (the overwhelmingly common case) the result is the pure
    * self-join plan — no union branch, no empty fragment-replicate stages,
    * no extra cache passes at execution; the probe also materializes the
    * cache the join is about to read. Default false preserves the DataFrame
    * contract (composing this operator, or .explain(), must not execute the
    * upstream pipeline); set it where the result is executed immediately
    * after construction, e.g. a query evaluated once per invocation.
    */
  def hybridBucketPairs(rows: DataFrame, bucketCols: Seq[String],
      idCol: String, maxBucketRows: Int = 4096, chunkSize: Int = 1024,
      eagerProbe: Boolean = false, payload: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBucket = Window.partitionBy(bucketCols.map(col): _*)
    val keyed = rows
      .withColumn("__bn", count(lit(1)).over(byBucket))
      .persistTracked()
    val bigSide = keyed.filter(col("__bn") > maxBucketRows)
    if (eagerProbe && bigSide.isEmpty)
      return plainPairs(keyed.drop("__bn"), bucketCols, idCol, payload)
    val cold = plainPairs(keyed.filter(col("__bn") <= maxBucketRows).drop("__bn"),
      bucketCols, idCol, payload)
    val hot = fragmentPairs(
      bigSide.withColumn("__nc", nChunks(col("__bn"), chunkSize)).drop("__bn"),
      bucketCols, idCol, payload, "__nc")
    cold.unionByName(hot)
  }

  /** Hybrid two-sided bucket equi-join: every (left, right) row pair
    * sharing a bucket, threshold-routed — the probe-prefix ⋈ posting-list
    * shape of [[Dedup.containmentJoin]], where one gram hot in the CORPUS
    * would otherwise put its whole posting list's pair work on one reducer.
    *
    * A bucket is hot when EITHER side exceeds `maxBucketRows` (per-key join
    * work is cntL·cntR; a 1×10⁶ bucket is as much of a straggler as a
    * 10³×10³ one). Hot-bucket rows are hash-chunked per side
    * (ncL = ceil(cntL/chunkSize), ncR likewise) and each side replicates
    * across the OTHER side's chunk axis, so the join key (bucket, kl, kr)
    * carries ≤ ~chunkSize² work and each pair meets in exactly one cell —
    * two-sided fragment-replicate (Stamos & Young, IEEE TKDE 1993, adapted
    * to hash chunks).
    *
    * Each side gets its own window COUNT over the bucket keys, which
    * hash-partitions that side's cache on the join key (no further
    * exchange for the cold join); the per-bucket size tables derived from
    * those caches are already co-partitioned, so assembling the hot list
    * (both sides' chunk counts) is exchange-free too.
    *
    * Output: bucketCols ++ left's other columns ++ right's other columns
    * (names must be disjoint). `eagerProbe` as in [[hybridBucketPairs]].
    */
  def hybridBucketJoin(left: DataFrame, right: DataFrame,
      bucketCols: Seq[String], leftId: String, rightId: String,
      maxBucketRows: Int = 4096, chunkSize: Int = 1024,
      eagerProbe: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBucket = Window.partitionBy(bucketCols.map(col): _*)
    val lk = left.withColumn("__cnl", count(lit(1)).over(byBucket)).persistTracked()
    val rk = right.withColumn("__cnr", count(lit(1)).over(byBucket)).persistTracked()
    // Hot list with BOTH sides' chunk counts, even when only one side is
    // big. Per-bucket size tables reduce each cache without an exchange
    // (already bucket-partitioned); the inner join also drops buckets
    // absent from one side — they produce no pairs anyway.
    val hot = lk.groupBy(bucketCols.map(col): _*).agg(max(col("__cnl")).as("__cl"))
      .join(rk.groupBy(bucketCols.map(col): _*).agg(max(col("__cnr")).as("__cr")),
        bucketCols)
      .filter(greatest(col("__cl"), col("__cr")) > maxBucketRows)
      .select(bucketCols.map(col) :+ nChunks(col("__cl"), chunkSize).as("__ncl") :+
        nChunks(col("__cr"), chunkSize).as("__ncr"): _*)
    if (eagerProbe && hot.isEmpty)
      return lk.drop("__cnl").join(rk.drop("__cnr"), bucketCols)

    val lr = lk.drop("__cnl").join(broadcast(hot), bucketCols, "left")
    val rr = rk.drop("__cnr").join(broadcast(hot), bucketCols, "left")
    val cold = lr.filter(col("__ncl").isNull).drop("__ncl", "__ncr")
      .join(rr.filter(col("__ncl").isNull).drop("__ncl", "__ncr"), bucketCols)
    val hotL = lr.filter(col("__ncl").isNotNull)
      .withColumn("__kl", pmod(xxhash64(col(leftId)), col("__ncl").cast("long")).cast("int"))
      .withColumn("__kr", explode(sequence(lit(0), col("__ncr") - 1)))
      .drop("__ncl", "__ncr")
    val hotR = rr.filter(col("__ncl").isNotNull)
      .withColumn("__kr", pmod(xxhash64(col(rightId)), col("__ncr").cast("long")).cast("int"))
      .withColumn("__kl", explode(sequence(lit(0), col("__ncl") - 1)))
      .drop("__ncl", "__ncr")
    // Explicit REPARTITION_BY_NUM on the cell keys, as in [[fragmentPairs]]:
    // the cell join's shuffle read is small but its output fans out
    // ~chunkSize× per row, which AQE's read-size-based coalescing can't see.
    val cellKeys = bucketCols ++ Seq("__kl", "__kr")
    val n = left.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val hotJoin = hotL.repartition(n, cellKeys.map(col): _*)
      .join(hotR.repartition(n, cellKeys.map(col): _*), cellKeys)
      .drop("__kl", "__kr")
    cold.unionByName(hotJoin)
  }
}
