package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (dedup, language ID, quality scoring, token counting).
  *
  * Everything here is a composition of codegen'd built-in expressions —
  * no UDFs, so whole-stage codegen spans stay wide and the same column
  * logic is expressible in the DuckDB oracle SQL verbatim.
  */
object TextFunctions {

  /** Canonical text form shared by every operator (and the oracle):
    * lowercase, whitespace collapsed to single spaces, trimmed. */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normalizeText(c), " ")

  /** Exact-dedup fingerprint: md5 of the normalized text. md5 is available
    * in both Spark and DuckDB with identical hex output, so fingerprints
    * are oracle-checkable (unlike xxhash64, which only Spark has). */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Distinct k-word shingles of a token array; empty when the document is
    * shorter than k tokens (guarded — sequence(1, n) with n < 1 would
    * generate a *descending* range, not an empty one). */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter * lit(1.0) / (size(a) + size(b) - inter)
  }

  /** Hamming distance between two 64-bit hashes (e.g. SimHash sketches
    * from graft.operators.Dedup — built there with explode + aggregation,
    * not per-row array lambdas, which are CodegenFallback and 10-50x
    * slower at scale). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
