package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan pruning.
  *
  * One sort column can only cluster one predicate dimension: a table laid
  * out by `x` answers `x BETWEEN ..` with tight row-group skipping but
  * scatters `y` across every file. Interleaving the bits of both
  * dimensions' rank buckets gives a space-filling curve where rows close
  * in (x, y) are close in the file order — so parquet's per-row-group
  * min/max statistics become tight in BOTH columns and a 2-D box
  * predicate skips most row groups at plan/read time. This is the layout
  * trick behind Delta/Iceberg OPTIMIZE ZORDER, built here from pure Spark
  * primitives: bucket → bit-interleave (codegen integer expressions) →
  * range-partitioned sort → write.
  *
  * At 100 TB the sort is Spark's distributed range sort (no single task
  * sees more than a partition), and the payoff compounds: row-group
  * skipping happens before decompression, so a selective 2-D query reads
  * a few files of a few partitions instead of the whole table.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative int columns
    * (a = odd positions, b = even): the Morton index. Pure
    * shift/mask/add — whole-stage codegen, no UDF. */
  def morton2(a: Column, b: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      (shiftright(a, i) % 2) * lit(1L << (2 * i + 1)) +
        (shiftright(b, i) % 2) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** Rank-bucket a column into [0, 2^bits) by its observed min/max —
    * affine + floor is monotone (in double arithmetic: subtract, multiply
    * and divide by positive constants are monotone in IEEE), so bucket
    * order == value order; doubles also dodge int overflow on wide
    * domains. */
  def rangeBucket(c: Column, lo: Column, hi: Column, bits: Int = 8): Column =
    when(hi === lo, lit(0)).otherwise(
      least(floor((c - lo) * lit((1 << bits).toDouble) / (hi - lo + lit(1.0))),
        lit((1 << bits) - 1))
    ).cast("int")

  /** Write `df` z-ordered by two numeric columns: bucket both dimensions,
    * sort by the Morton index (distributed range sort), and cap records
    * per file so min/max file statistics stay tight. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int = 8, recordsPerFile: Int = 10000): Unit = {
    val bounds = df.agg(
      min(col(xCol)).as("xlo"), max(col(xCol)).as("xhi"),
      min(col(yCol)).as("ylo"), max(col(yCol)).as("yhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", morton2(
        rangeBucket(col(xCol), col("xlo"), col("xhi"), bits),
        rangeBucket(col(yCol), col("ylo"), col("yhi"), bits), bits))
      .drop("xlo", "xhi", "ylo", "yhi")
      .orderBy(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", recordsPerFile)
      .parquet(path)
  }
}
