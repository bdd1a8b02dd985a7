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

  /** MinHash signature of a shingle set: numPerm simulated permutations.
    * Each shingle is hashed once (xxhash64), then re-mixed per permutation
    * by hashing (permIndex, baseHash) — no multiply, so ANSI-mode overflow
    * checking never trips. O(numPerm · |shingles|) per row, fully codegen.
    * Cf. Broder, "On the resemblance and containment of documents" (1997).
    */
  def minhashSignature(shingles: Column, numPerm: Int): Column =
    transform(sequence(lit(0), lit(numPerm - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, xxhash64(s)))))

  /** LSH band keys: the signature split into `bands` slices of
    * `rowsPerBand`, each slice hashed to one long. Two documents collide on
    * a band iff that signature slice matches exactly. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter * lit(1.0) / (size(a) + size(b) - inter)
  }

  private val bitMasks: Column = typedlit((0 until 64).map(i => 1L << i))

  /** 64-bit SimHash of a token array: per bit, majority vote over the
    * distinct token hashes (bit k of the sketch is 1 iff more than half the
    * hashes have bit k set). Near-duplicates land within a few bits of each
    * other — compare with [[hammingDistance]]. Charikar, "Similarity
    * estimation techniques from rounding algorithms" (2002). Bit tests use
    * mask AND (not shifts — the shift builtins take only literal shift
    * amounts, and masks avoid sign headaches on bit 63). */
  def simhash(toks: Column): Column = {
    val hs = array_distinct(transform(toks, t => xxhash64(t)))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, k) => {
        val mask = get(bitMasks, k)
        val ones = size(filter(hs, h => h.bitwiseAND(mask) =!= lit(0L)))
        acc.bitwiseOR(when(ones * 2 > size(hs), mask).otherwise(lit(0L)))
      })
  }

  /** Hamming distance between two 64-bit hashes. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
