package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Materialized positional inverted index — the text analogue of the
  * [[ZOrder]] layout: pay one explode at INGEST so that every later
  * phrase/term probe is a partition-pruned read instead of a corpus scan.
  *
  * Layout: one row per (term, doc_id, pos), written
  * `partitionBy(term_bucket)` where term_bucket = md5(term) mod buckets —
  * the engine-portable hash convention (q89/q93). A probe for an n-term
  * phrase touches at most n of the `buckets` partitions: the scan's
  * partition filter prunes the rest at planning time (proven live in
  * SourcesSpec, the ZOrder-spec pattern), and the residual `term IN (...)`
  * predicate pushes into the parquet row-group stats of what remains. At
  * 100 TB the index is ~tokens-count rows, but a probe reads only
  * n/buckets of it — the classic search-engine posting-list contract from
  * pure Spark primitives.
  *
  * Positions are 0-based (posexplode); consumers emit 1-based like q152.
  */
object InvertedIndex {

  private def bucketCol(term: Column, buckets: Int): Column =
    pmod(conv(substring(md5(term), 1, 14), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Driver-side twin of [[bucketCol]] — must agree bit-for-bit so probe
    * partition filters are literals, never a join. md5 hex is lowercase in
    * both; 14 hex chars < 2^56 parse exactly into a Long. */
  def bucketOf(term: String, buckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 14)
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  /** Explode the corpus once and write the bucket-partitioned index,
    * plus a `_graft_meta` sidecar recording the bucket count — the layout
    * parameter every later append/probe MUST agree with bit-for-bit
    * (a mismatched count would route postings into, or probe, the wrong
    * term_bucket partitions silently). */
  def build(docs: DataFrame, path: String, buckets: Int = 64): Unit = {
    postings(docs, buckets)
      .write.mode("overwrite").partitionBy("term_bucket").parquet(path)
    writeMeta(docs.sparkSession, path, buckets)
  }

  /** The sidecar is a one-line text file so any engine (or a human) can
    * read the layout contract; Hadoop FS API keeps it portable to
    * HDFS/object stores at scale. */
  private def writeMeta(spark: SparkSession, path: String, buckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_meta")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"buckets=$buckets\n".getBytes("UTF-8")) finally out.close()
  }

  private def readMetaBuckets(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_meta")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"no _graft_meta under $path — not a built index " +
      "(InvertedIndex.build writes it; append/probe refuse to guess the bucket count)")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.collectFirst {
      case l if l.startsWith("buckets=") => l.stripPrefix("buckets=").trim.toInt
    }.getOrElse(sys.error(s"malformed _graft_meta under $path: '$text'"))
  }

  /** Validate a caller-supplied bucket count against the built layout's —
    * a mismatch is a silent-wrong-answer bug (postings land in / probes
    * read the wrong partitions), so it throws loudly instead. */
  private def requireBuckets(spark: SparkSession, path: String, buckets: Int): Unit = {
    val built = readMetaBuckets(spark, path)
    require(built == buckets,
      s"bucket-count mismatch for index at $path: built with $built, called with $buckets")
  }

  /** Incremental index maintenance: APPEND a new document batch's
    * postings into the existing layout. Parquet partition dirs take
    * appended files natively — each new batch adds files only under the
    * term buckets it actually touches, existing postings are never
    * rewritten, and probes see old and new documents identically (the
    * partition filter selects directories, not write generations). This
    * is the ingest-time contract of a real search index: build once,
    * then absorb document batches without a full rebuild. Callers own
    * dedup (appending the same doc twice duplicates its postings, like
    * any append-only log — route batches through the q108-style
    * incremental dedup first). The bucket count is validated against the
    * layout's `_graft_meta` sidecar — an append with a different count
    * would silently write postings into wrong partitions. */
  def append(newDocs: DataFrame, path: String, buckets: Int = 64): Unit = {
    requireBuckets(newDocs.sparkSession, path, buckets)
    postings(newDocs, buckets)
      .write.mode("append").partitionBy("term_bucket").parquet(path)
  }

  /** Logical DELETE by tombstone — the third index-lifecycle verb
    * ([[build]], [[append]], delete): removing a document does NOT
    * rewrite posting files (that would touch every term bucket the doc's
    * terms hash into — an unbounded rewrite at 100 TB). Instead the
    * doc_ids land in an append-only `_tombstones` side table (the
    * underscore prefix keeps it invisible to the postings scan) and
    * every probe anti-joins it — exactly how log-structured stores and
    * lakehouse formats delete. Re-deleting is idempotent at read time
    * (anti-join semantics); physically compacting tombstones away stays
    * an explicit rebuild decision, like quantizer retraining. */
  def delete(docIds: DataFrame, path: String): Unit =
    docIds.select(col("doc_id").cast("long"))
      .write.mode("append").parquet(s"$path/_tombstones")

  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  private def postings(docs: DataFrame, buckets: Int): DataFrame =
    docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
      .withColumn("term_bucket", bucketCol(col("term"), buckets))

  /** Phrase probe against a built index: q152's anchor-vote logic (term i
    * at position p votes for anchor p−i; an anchor with all n distinct
    * offsets is a match), but reading ONLY the phrase terms' partitions.
    * Output schema matches q152: (doc_id, n_matches, first_pos 1-based). */
  def phraseProbe(spark: SparkSession, path: String, terms: Seq[String],
      buckets: Int = 64): DataFrame = {
    require(terms.distinct.size == terms.size,
      "anchor-vote counting needs distinct phrase terms")
    requireBuckets(spark, path, buckets)
    val termBuckets = terms.map(bucketOf(_, buckets)).distinct
    val off = terms.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (t, i)) =>
        when(col("term") === t, lit(i)).otherwise(acc) }
    val live = tombstones(spark, path) match {
      case Some(dead) => spark.read.parquet(path)
        .join(dead.select(col("doc_id")), Seq("doc_id"), "left_anti")
      case None => spark.read.parquet(path)
    }
    live
      .filter(col("term_bucket").isin(termBuckets: _*) &&
        col("term").isin(terms: _*))
      .select(col("doc_id"), (col("pos") - off).as("anchor"), off.as("i"))
      .groupBy(col("doc_id"), col("anchor"))
      .agg(countDistinct(col("i")).as("hits"))
      .filter(col("hits") === terms.size)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        (min(col("anchor")) + 1).cast("long").as("first_pos"))
      .orderBy(col("n_matches").desc, col("doc_id"))
  }
}
