package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-3 training-pipeline operators: decontamination,
  * repetition ratio, PII redaction, and semantic dedup — semantics the
  * oracle restates but doesn't explain (oracle failures say "hash differs",
  * these say which invariant broke). */
class TrainingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("decontamination flags an exact holdout copy with hit_frac 1.0") {
    import spark.implicits._
    val holdout = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (2L, "alpha beta gamma delta epsilon"), // exact copy → frac 1.0
      (3L, "zeta eta theta iota kappa"), // disjoint → absent
      (4L, "alpha beta gamma lambda mu nu") // 1 of 4 grams shared
    ).toDF("doc_id", "text")
    val got = operators.Decontaminate.ngramOverlap(corpus, holdout, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(2L, 4L), s"wrong contamination set: $got")
    assert(got(2L) == ((3L, 3L, 1.0)))
    assert(got(4L) == ((4L, 1L, 0.25)))
  }

  test("repetition ratio is 0 for unique grams and high for a looped doc") {
    import spark.implicits._
    val q36 = SparkEntry.queries("q36_repetition")
    val ratios = q36(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(ratios.nonEmpty)
    ratios.foreach { case (n, nd, ratio) =>
      assert(nd <= n && ratio >= 0.0 && ratio < 1.0)
      assert(math.abs(ratio - (n - nd).toDouble / n) < 1e-12)
    }
  }

  test("pii redaction removes every email and ip it counted") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at a.b-c_1@mail-host.org or 192.168.0.1 thanks"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io z@w.dev and 10.0.0.255 10.1.2.3")
    ).toDF("id", "s")
    val checked = df.select(col("id"),
      operators.Pii.emailCount(col("s")).as("ne"),
      operators.Pii.ipCount(col("s")).as("ni"),
      operators.Pii.emailCount(operators.Pii.redact(col("s"))).as("ne_after"),
      operators.Pii.ipCount(operators.Pii.redact(col("s"))).as("ni_after"),
      operators.Pii.redact(col("s")).as("red"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(checked(1L).getInt(1) == 1 && checked(1L).getInt(2) == 1)
    assert(checked(2L).getInt(1) == 0 && checked(2L).getInt(2) == 0)
    assert(checked(3L).getInt(1) == 2 && checked(3L).getInt(2) == 2)
    checked.values.foreach { r =>
      assert(r.getInt(3) == 0 && r.getInt(4) == 0,
        s"redacted text still matches: ${r.getString(5)}")
    }
    assert(checked(1L).getString(5).contains("<EMAIL>") &&
      checked(1L).getString(5).contains("<IP>"))
  }

  test("int8 quantization stays on the 8-bit grid with tiny reconstruction error") {
    val rows = SparkEntry.queries("q57_quantize_int8")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dim, maxQ, mse) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(maxQ == 127L, s"symmetric scale must peak at ±127, got $maxQ")
      assert(dim > 0 && mse >= 0.0)
      // worst-case per-element error is (0.5/scale)^2; scale ≥ 127/max|v|
      // keeps mse_ppm far below this loose structural bound
      assert(mse < 1e6, s"reconstruction error implausibly large: $mse ppm")
    }
  }

  test("duplicate-span stats flag exactly the cross-document spans") {
    import spark.implicits._
    // docs 1 and 2 share one 5-token window ("a b c d e", at positions 1
    // and 2 respectively); doc 3 is disjoint; doc 4 repeats a span WITHIN
    // itself only (self-repeats are not cross-document duplicates)
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d e"),
      (3L, "p q r s t u"),
      (4L, "m n o v w m n o v w")
    ).toDF("doc_id", "text")
    val got = operators.Dedup.duplicateSpanStats(docs, "doc_id", "text", k = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getInt(4).toLong)).toMap
    // doc 1: grams at pos 1,2 — "a b c d e" (dup) and "b c d e f"
    assert(got(1L)._1 == 2 && got(1L)._2 == 1 && got(1L)._3 == 1, s"doc1: ${got(1L)}")
    // doc 2: grams "x a b c d", "a b c d e"(dup at pos 2)
    assert(got(2L)._1 == 2 && got(2L)._2 == 1 && got(2L)._3 == 2, s"doc2: ${got(2L)}")
    assert(got(3L)._2 == 0 && got(3L)._3 == -1, s"doc3: ${got(3L)}")
    assert(got(4L)._2 == 0, s"doc4 self-repeat wrongly flagged: ${got(4L)}")
  }

  test("unigram surprisal is positive and rare tokens score above common ones") {
    val rows = SparkEntry.queries("q39_unigram_surprisal")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, s) =>
      assert(n > 0 && s > 0.0, s"doc $id: degenerate surprisal ($n tokens, $s)")
    }
    // sanity of the LM itself: uniform-ish corpus → mean surprisal within
    // [ln(1), ln(vocab-size-upper-bound)]; the testdata vocab is ~30 words
    rows.foreach { case (id, _, s) =>
      assert(s < math.log(1e6), s"doc $id: surprisal $s implies absurd vocab")
    }
  }

  test("every document contributes exactly its two injected URLs") {
    val rows = SparkEntry.queries("q59_url_domains")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == 2 * nDocs,
      s"extracted ${rows.map(_._2).sum} urls from $nDocs docs (expected 2/doc)")
    assert(rows.forall { case (d, _, _, u) => u.contains(d) },
      "sample_url must contain its domain")
    assert(rows.map(_._1).distinct.length == rows.length, "domains must be distinct")
  }

  test("semantic dedup clusters are consistent with their pair graph") {
    val q56 = SparkEntry.queries("q56_semantic_dedup")
    val labels = q56(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = operators.Similarity.lshSimilarPairs(
      Tables.embeddings(spark, sf), 0.4, numTables = 6, planesPerTable = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && labels.nonEmpty)
    // every paired vector pair shares a cluster rep, and the rep is a
    // cluster member that labels itself (the canonical row)
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    labels.values.foreach(rep => assert(labels(rep) == rep,
      s"rep $rep is not its own cluster's canonical"))
    labels.foreach { case (id, rep) => assert(rep <= id) }
  }
}
