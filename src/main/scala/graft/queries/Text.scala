package graft.queries

import graft.CacheLifecycle.TrackedPersistOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Text-analysis + deduplication pack over the `documents` table — the
  * training-data-pipeline operators (SURVEY.md §2 Tier B north-star rows):
  * token statistics, quality scoring, language ID, exact dedup by
  * fingerprint, n-gram frequencies, and MinHash-LSH near-dup pairs.
  *
  * Every operator shares one canonical normalization (TextFunctions), so
  * the DuckDB oracle can state the same logic verbatim. All of it is
  * per-row expression work plus one groupBy/join — linear scans that
  * partition freely at 100 TB.
  */
object Text {

  // --- q40: token statistics ----------------------------------------------
  def q40(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("toks", tokens($"text"))
      .select($"doc_id", $"lang", $"source",
        size($"toks").as("n_tokens"),
        size(array_distinct($"toks")).as("n_distinct"),
        (size(array_distinct($"toks")) * lit(1.0) / size($"toks")).as("ttr"),
        length(normalizeText($"text")).as("n_chars_norm"),
        ceil(length(normalizeText($"text")) / 3.5).cast("long").as("n_tokens_bpeish"))
      .orderBy($"doc_id")
  }
  val q40Sql: String =
    """SELECT doc_id, lang, source,
      |  len(t) AS n_tokens,
      |  len(list_distinct(t)) AS n_distinct,
      |  len(list_distinct(t)) * 1.0 / len(t) AS ttr,
      |  length(norm) AS n_chars_norm,
      |  CAST(CEIL(length(norm) / 3.5) AS BIGINT) AS n_tokens_bpeish
      |FROM (
      |  SELECT doc_id, lang, source, norm, string_split(norm, ' ') AS t
      |  FROM (SELECT doc_id, lang, source,
      |          lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  // --- q41: quality scoring -----------------------------------------------
  // Length/stopword/repetition heuristics à la C4/Gopher filtering rules;
  // one deterministic double formula, identical in the oracle.
  def q41(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stop = Seq("the", "a", "of", "and", "in", "to")
    Tables.documents(s, d)
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("stop_ratio",
        size(filter($"toks", t => t.isInCollection(stop))) * lit(1.0) / $"n_tokens")
      .withColumn("ttr",
        size(array_distinct($"toks")) * lit(1.0) / $"n_tokens")
      .withColumn("len_score",
        least($"n_tokens" * lit(1.0) / 64.0, lit(1.0)))
      .withColumn("quality_score",
        round($"len_score" * 0.4 + $"ttr" * 0.4 + least($"stop_ratio" * 4.0, lit(1.0)) * 0.2, 6))
      .filter($"n_tokens" > 0)
      .select($"doc_id", $"n_tokens", round($"stop_ratio", 6).as("stop_ratio"),
        round($"ttr", 6).as("ttr"), $"quality_score")
      .orderBy($"doc_id")
  }
  val q41Sql: String =
    """SELECT doc_id, n_tokens,
      |  ROUND(stop_ratio, 6) AS stop_ratio,
      |  ROUND(ttr, 6) AS ttr,
      |  ROUND(len_score * 0.4 + ttr * 0.4 + LEAST(stop_ratio * 4.0, 1.0) * 0.2, 6) AS quality_score
      |FROM (
      |  SELECT doc_id, len(t) AS n_tokens,
      |    len(list_filter(t, x -> x IN ('the','a','of','and','in','to'))) * 1.0 / len(t) AS stop_ratio,
      |    len(list_distinct(t)) * 1.0 / len(t) AS ttr,
      |    LEAST(len(t) * 1.0 / 64.0, 1.0) AS len_score
      |  FROM (SELECT doc_id,
      |          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |        FROM documents)
      |  WHERE len(t) > 0)
      |ORDER BY doc_id""".stripMargin

  // --- q42: language identification (marker-word heuristic) ---------------
  // Deterministic n-gram/stopword heuristic: score each candidate language
  // by marker-token hits, argmax with a fixed precedence. Confusion matrix
  // (actual lang label × prediction) keeps the output compact.
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "et", "une"))

  def q42(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val withToks = Tables.documents(s, d).withColumn("toks", tokens($"text"))
    val scored = markers.foldLeft(withToks) { case (df, (l, ws)) =>
      df.withColumn(s"s_$l", size(filter($"toks", t => t.isInCollection(ws))))
    }
    scored
      .withColumn("lang_pred",
        when($"s_en" >= $"s_es" && $"s_en" >= $"s_de" && $"s_en" >= $"s_fr", "en")
          .when($"s_es" >= $"s_de" && $"s_es" >= $"s_fr", "es")
          .when($"s_de" >= $"s_fr", "de")
          .otherwise("fr"))
      .groupBy($"lang", $"lang_pred")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"lang_pred")
  }
  val q42Sql: String =
    """SELECT lang, lang_pred, COUNT(*) AS n_docs
      |FROM (
      |  SELECT lang,
      |    CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
      |         WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
      |         WHEN s_de >= s_fr THEN 'de'
      |         ELSE 'fr' END AS lang_pred
      |  FROM (
      |    SELECT lang,
      |      len(list_filter(t, x -> x IN ('the','a','and','of'))) AS s_en,
      |      len(list_filter(t, x -> x IN ('el','la','de','y'))) AS s_es,
      |      len(list_filter(t, x -> x IN ('der','die','und','das'))) AS s_de,
      |      len(list_filter(t, x -> x IN ('le','les','et','une'))) AS s_fr
      |    FROM (SELECT lang,
      |            string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |          FROM documents)))
      |GROUP BY lang, lang_pred
      |ORDER BY lang, lang_pred""".stripMargin

  // --- q43: exact dedup via md5 fingerprint -------------------------------
  def q43(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.exact(Tables.documents(s, d), $"text", $"doc_id")
      .filter($"keep")
      .select($"doc_id", $"fp", $"n_copies")
      .orderBy($"doc_id")
  }
  val q43Sql: String =
    """SELECT doc_id, fp, n_copies FROM (
      |  SELECT doc_id, fp,
      |    COUNT(*) OVER (PARTITION BY fp) AS n_copies,
      |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |  FROM (SELECT doc_id,
      |          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |        FROM documents))
      |WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  // --- q44: corpus bigram frequencies, top 50 -----------------------------
  def q44(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= 2)
      .select(explode(transform(sequence(lit(1), size($"toks") - 1),
        i => concat_ws(" ", slice($"toks", i, lit(2))))).as("bigram"))
      .groupBy($"bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"bigram")
      .limit(50)
  }
  val q44Sql: String =
    """SELECT bigram, COUNT(*) AS n
      |FROM (
      |  SELECT unnest(list_transform(range(1, len(t)),
      |    i -> t[i] || ' ' || t[i+1])) AS bigram
      |  FROM (SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |        FROM documents)
      |  WHERE len(t) >= 2)
      |GROUP BY bigram
      |ORDER BY n DESC, bigram
      |LIMIT 50""".stripMargin

  // --- q175: word2phrase collocation detection -----------------------------
  // Mikolov et al. 2013's phrase-induction score (the word2vec
  // `word2phrase` pass tokenizer pipelines run before training):
  // score(a b) = (count(ab) − δ) / (count(a) · count(b)), δ = 5,
  // over adjacent-token bigrams; high scorers become single vocabulary
  // units. Exactness is the q154 rule applied ahead of its design point:
  // the unigram-count product is computed in decimal(38,0)/HUGEINT (a
  // long·long product overflows at real corpus counts; decimal is exact),
  // and the single division is snapped ONCE to the 1e-15 integer grid —
  // scores are bounded below 0.1 (ca, cb ≥ cab ⇒ score < 1/cab ≤ 0.1),
  // so score·1e15 < 1e14 < 2^53 fits a long exactly, and the snap
  // absorbs the ~1-ulp cross-engine wobble of int128→double conversion
  // once counts cross 2^53 (at test SFs the pre-snap values are already
  // bit-identical, so the snap is hash-neutral). Shape: one token explode feeding
  // BOTH count tables (unigrams and bigrams are separate aggregations of
  // the same scan), unigram counts attach to the bigram table by two
  // joins on the word — vocab-sized (Heaps' law), corpus touched once —
  // then TakeOrderedAndProject top-30 by (score desc, bigram).
  def q175(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= 2)
    val uni = toks.select(explode($"toks").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c1"))
    val bi = toks
      .select(explode(transform(sequence(lit(1), size($"toks") - 1),
        i => struct(element_at($"toks", i).as("wa"),
          element_at($"toks", i + 1).as("wb")))).as("b"))
      .groupBy($"b.wa".as("wa"), $"b.wb".as("wb"))
      .agg(count(lit(1)).as("cab"))
      .filter($"cab" >= 10)
    bi.join(uni.select($"w".as("wa"), $"c1".as("ca")), "wa")
      .join(uni.select($"w".as("wb"), $"c1".as("cb")), "wb")
      .select(concat_ws(" ", $"wa", $"wb").as("bigram"),
        $"cab", $"ca", $"cb",
        (round(($"cab" - 5).cast("double") /
            ($"ca".cast("decimal(38,0)") * $"cb".cast("decimal(38,0)"))
              .cast("double") * 1e15)
          .cast("long").cast("double") / 1e15).as("score"))
      .orderBy($"score".desc, $"bigram")
      .limit(30)
  }
  val q175Sql: String =
    """WITH d AS (
      |  SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |dd AS (SELECT t FROM d WHERE len(t) >= 2),
      |uni AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
      |  FROM (SELECT unnest(t) AS w FROM dd) GROUP BY w),
      |bi AS (
      |  SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS cab FROM (
      |    SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS wa,
      |           unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS wb
      |    FROM dd)
      |  GROUP BY wa, wb HAVING COUNT(*) >= 10)
      |SELECT wa || ' ' || wb AS bigram, cab, ca, cb,
      |  CAST(CAST(round(CAST(cab - 5 AS DOUBLE)
      |    / CAST(CAST(ca AS HUGEINT) * cb AS DOUBLE) * 1e15) AS BIGINT)
      |    AS DOUBLE) / 1e15 AS score
      |FROM bi
      |JOIN (SELECT w AS wa, c1 AS ca FROM uni) USING (wa)
      |JOIN (SELECT w AS wb, c1 AS cb FROM uni) USING (wb)
      |ORDER BY score DESC, bigram
      |LIMIT 30""".stripMargin

  // --- q198: bigram-LM negative log-likelihood scoring ----------------------
  // One modeling order above q39's unigram surprisal — the classic
  // perplexity-filter signal (CCNet/KenLM style) from a self-trained
  // bigram LM with add-1 smoothing: p(b|a) = (c(ab)+1)/(c(a)+V), each
  // document scored by its mean −ln p over adjacent-token bigrams. Low
  // scores flag boilerplate, high scores flag noise — the two clip ends
  // of a curation pipeline. Exactness is q39's convention verbatim:
  // per-bigram −ln is rounded to 4 decimals BEFORE aggregating (ln may
  // differ 1 ulp between libm and java.lang.Math), then everything is
  // exact integer arithmetic in 1e-4 units — long sums, integer division
  // by the bigram count, one final exact division. Probability inputs
  // (c(ab)+1, c(a)+V) are exact integers ≪ 2^53.
  //
  // Scale: unigram counts and V broadcast (Heaps' law); the bigram score
  // table is bigram-vocab-sized — larger than the unigram vocab, so it
  // attaches to the per-doc bigram stream by an ordinary hash join on
  // (wa, wb), NOT a broadcast; the only corpus-sized stages are the two
  // count aggregations and the per-doc rollup.
  def q198(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= 2)
    val uni = toks.select(explode($"toks").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c1"))
    val vSize = uni.agg(count(lit(1)).as("v"))
    val docBi = toks
      .select($"doc_id", explode(transform(sequence(lit(1), size($"toks") - 1),
        i => struct(element_at($"toks", i).as("wa"),
          element_at($"toks", i + 1).as("wb")))).as("b"))
      .select($"doc_id", $"b.wa".as("wa"), $"b.wb".as("wb"))
    val biCnt = docBi.groupBy($"wa", $"wb").agg(count(lit(1)).as("cab"))
    val scored = biCnt
      .join(broadcast(uni.select($"w".as("wa"), $"c1".as("ca"))), "wa")
      .crossJoin(broadcast(vSize))
      .select($"wa", $"wb",
        round(-log(($"cab" + 1).cast("double") / ($"ca" + $"v")), 4).as("nll"))
    docBi.join(scored, Seq("wa", "wb"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(round($"nll" * 10000).cast("long")).as("nll4"))
      .withColumn("avg_nll", expr("nll4 div n_bigrams") / 10000.0)
      .select($"doc_id", $"n_bigrams", $"avg_nll")
      .orderBy($"doc_id")
  }
  val q198Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |dd AS (SELECT doc_id, t FROM d WHERE len(t) >= 2),
      |uni AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
      |  FROM (SELECT unnest(t) AS w FROM dd) GROUP BY w),
      |vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
      |docbi AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(t)), i -> t[i])) AS wa,
      |    unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS wb
      |  FROM dd),
      |bi AS (
      |  SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS cab
      |  FROM docbi GROUP BY wa, wb),
      |scored AS (
      |  SELECT wa, wb,
      |    ROUND(-ln(CAST(cab + 1 AS DOUBLE) / (ca + v)), 4) AS nll
      |  FROM bi
      |  JOIN (SELECT w AS wa, c1 AS ca FROM uni) USING (wa)
      |  CROSS JOIN vs)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  (CAST(SUM(CAST(ROUND(nll * 10000, 0) AS BIGINT)) AS BIGINT)
      |    // COUNT(*)) / 10000.0 AS avg_nll
      |FROM docbi JOIN scored USING (wa, wb)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // --- q179: pointwise mutual information + corpus MI -----------------------
  // The dependence diagnostic between two categorical document facets
  // (lang × source): per-cell PMI = ln(c·n / (ca·cb)) and the corpus
  // MI = Σ (c/n)·PMI — the feature-relevance score used for metadata
  // audit and stratification design. Exactness is the q106 convention:
  // every ln argument is a ratio of exact integer products (c·n ≤ ~2.5e9
  // ≪ 2^53), each cell's MI contribution is computed in ONE fixed op
  // chain and snapped to the 1e-9 integer grid, and the corpus sum is
  // exact integer addition — merge-order-proof. Shape: one (lang,
  // source) cell aggregation (the only corpus-sized shuffle) + two
  // broadcast margin tables; per-cell output + the global MI attached by
  // a one-row broadcast.
  def q179(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.documents(s, d)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("c"))
    val byLang = cells.groupBy($"lang").agg(sum($"c").as("ca"))
    val bySrc = cells.groupBy($"source").agg(sum($"c").as("cb"))
    val tot = cells.agg(sum($"c").as("n"))
    val scored = cells
      .join(broadcast(byLang), "lang")
      .join(broadcast(bySrc), "source")
      .crossJoin(broadcast(tot))
      .withColumn("pmi9", round(
        log(($"c" * $"n").cast("double") / ($"ca" * $"cb")) * lit(1e9))
        .cast("long"))
      .withColumn("mi9", round(
        log(($"c" * $"n").cast("double") / ($"ca" * $"cb"))
          * $"c" / $"n" * lit(1e9)).cast("long"))
    val mi = scored.agg(sum($"mi9").as("mi9_total"))
    scored.crossJoin(broadcast(mi))
      .select($"lang", $"source", $"c", $"ca", $"cb",
        ($"pmi9".cast("double") / 1e9).as("pmi"),
        ($"mi9_total".cast("double") / 1e9).as("corpus_mi"))
      .orderBy($"lang", $"source")
  }
  val q179Sql: String =
    """WITH cells AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |bl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS ca FROM cells GROUP BY 1),
      |bs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cb FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
      |scored AS (
      |  SELECT lang, source, c, ca, cb,
      |    CAST(round(ln(CAST(c * n AS DOUBLE) / (ca * cb)) * 1e9) AS BIGINT)
      |      AS pmi9,
      |    CAST(round(ln(CAST(c * n AS DOUBLE) / (ca * cb)) * c / n * 1e9)
      |      AS BIGINT) AS mi9
      |  FROM cells JOIN bl USING (lang) JOIN bs USING (source) CROSS JOIN tot),
      |mi AS (SELECT CAST(SUM(mi9) AS BIGINT) AS mi9_total FROM scored)
      |SELECT lang, source, c, ca, cb,
      |  CAST(pmi9 AS DOUBLE) / 1e9 AS pmi,
      |  CAST(mi9_total AS DOUBLE) / 1e9 AS corpus_mi
      |FROM scored CROSS JOIN mi
      |ORDER BY lang, source""".stripMargin

  // --- q186: language-ID quality evaluation ---------------------------------
  // q42 produces the langid confusion matrix; this scores it — per-language
  // precision/recall/F1 of the stopword-marker heuristic against the
  // labeled truth, the q178 convention applied to the text family:
  // tp/fp/fn from two matrix-sized aggregations, F1 directly from
  // integers as 2·tp/(2·tp+fp+fn), NULL on degenerate denominators. The
  // heavy stage is q42's single corpus scan; everything after is
  // vocab-of-languages-sized.
  def q186(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cm = q42(s, d) // (lang, lang_pred, n_docs)
    val byTrue = cm.groupBy($"lang".as("language"))
      .agg(sum($"n_docs").as("support"),
        sum(when($"lang" === $"lang_pred", $"n_docs").otherwise(0L)).as("tp"))
    val byPred = cm.groupBy($"lang_pred".as("language"))
      .agg(sum($"n_docs").as("n_predicted"))
    byTrue.join(byPred, Seq("language"), "left")
      .select($"language", $"support", $"tp",
        (coalesce($"n_predicted", lit(0L)) - $"tp").as("fp"),
        ($"support" - $"tp").as("fn"))
      .select($"language", $"support", $"tp", $"fp", $"fn",
        when($"tp" + $"fp" === 0, lit(null).cast("double"))
          .otherwise($"tp".cast("double") / ($"tp" + $"fp")).as("precision"),
        ($"tp".cast("double") / $"support").as("recall"),
        when($"tp" * 2 + $"fp" + $"fn" === 0, lit(null).cast("double"))
          .otherwise(($"tp" * 2).cast("double") / ($"tp" * 2 + $"fp" + $"fn"))
          .as("f1"))
      .orderBy($"language")
  }
  val q186Sql: String =
    """WITH cm AS (
      |  SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM (
      |    SELECT lang,
      |      CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
      |           WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
      |           WHEN s_de >= s_fr THEN 'de'
      |           ELSE 'fr' END AS lang_pred
      |    FROM (
      |      SELECT lang,
      |        len(list_filter(t, x -> x IN ('the','a','and','of'))) AS s_en,
      |        len(list_filter(t, x -> x IN ('el','la','de','y'))) AS s_es,
      |        len(list_filter(t, x -> x IN ('der','die','und','das'))) AS s_de,
      |        len(list_filter(t, x -> x IN ('le','les','et','une'))) AS s_fr
      |      FROM (SELECT lang,
      |              string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |            FROM documents)))
      |  GROUP BY lang, lang_pred),
      |bt AS (
      |  SELECT lang AS language, CAST(SUM(n_docs) AS BIGINT) AS support,
      |    CAST(SUM(CASE WHEN lang = lang_pred THEN n_docs ELSE 0 END)
      |      AS BIGINT) AS tp
      |  FROM cm GROUP BY 1),
      |bp AS (
      |  SELECT lang_pred AS language, CAST(SUM(n_docs) AS BIGINT) AS n_predicted
      |  FROM cm GROUP BY 1),
      |m AS (
      |  SELECT bt.language, support, tp,
      |    COALESCE(n_predicted, 0) - tp AS fp, support - tp AS fn
      |  FROM bt LEFT JOIN bp ON bt.language = bp.language)
      |SELECT language, support, tp, fp, fn,
      |  CASE WHEN tp + fp = 0 THEN NULL
      |       ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
      |  CAST(tp AS DOUBLE) / support AS recall,
      |  CASE WHEN tp * 2 + fp + fn = 0 THEN NULL
      |       ELSE CAST(tp * 2 AS DOUBLE) / (tp * 2 + fp + fn) END AS f1
      |FROM m
      |ORDER BY language""".stripMargin

  // --- q187: per-source duplication-rate dashboard --------------------------
  // The curation metric behind source weighting decisions: per source,
  // how much of it is exact-duplicate mass (q43's md5 fingerprint rule),
  // both at the doc level (share of docs that are non-canonical copies)
  // and the within-source unique-text ratio. Exact integer counts and
  // single-division ratios; one fingerprint aggregation + one
  // source-keyed rollup.
  def q187(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", $"source",
        md5(normalizeText($"text")).as("fp"))
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy($"fp")
      .orderBy($"doc_id")
    val flagged = docs.withColumn("is_copy",
      when(row_number().over(wFp) === 1, 0L).otherwise(1L))
    flagged.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"is_copy").as("n_copies"),
        countDistinct($"fp").as("n_unique_texts"))
      .select($"source", $"n_docs", $"n_copies", $"n_unique_texts",
        ($"n_copies".cast("double") / $"n_docs").as("copy_rate"),
        ($"n_unique_texts".cast("double") / $"n_docs").as("unique_ratio"))
      .orderBy($"source")
  }
  val q187Sql: String =
    """WITH f AS (
      |  SELECT doc_id, source,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |  FROM documents),
      |flagged AS (
      |  SELECT source, fp,
      |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
      |         THEN 0 ELSE 1 END AS is_copy
      |  FROM f)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(is_copy) AS BIGINT) AS n_copies,
      |  CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_texts,
      |  CAST(SUM(is_copy) AS DOUBLE) / COUNT(*) AS copy_rate,
      |  CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*) AS unique_ratio
      |FROM flagged
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --- q45: MinHash-LSH near-duplicate pairs ------------------------------
  // The LSH candidate set is verified with exact Jaccard, and recall at
  // threshold 0.6 is 1 - O(1e-7) (Dedup.nearDuplicatePairs) — so the
  // output matches a brute-force all-pairs SQL oracle.
  def q45(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.nearDuplicatePairs(Tables.documents(s, d), "doc_id", "text",
      k = 3, threshold = 0.6, eagerSkewProbe = true)
      .orderBy($"doc_a", $"doc_b")
  }
  val q45Sql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM (SELECT doc_id,
      |          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |        FROM documents)
      |  WHERE len(t) >= 3
      |)
      |SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.s, b.s)) * 1.0
      |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |WHERE jaccard >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  // --- q216: cross-split contamination audit (near-dups straddling splits) --
  // The leakage check q89's split and q45's near-dup detection exist to
  // feed: near-duplicate pairs whose members land in DIFFERENT
  // train/val/test splits are evaluation contamination (the val doc is
  // effectively in training), and hash-based splitting cannot prevent
  // it — near-dups hash independently. Pairs come from the proven
  // banding+rerank operator; splits from q89's portable md5 rule; the
  // report is pair counts per unordered split combination with an
  // is_leak flag (off-diagonal = contaminated). Exact counts; the heavy
  // stage is the audited q45 candidate generation.
  def q216(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val bucket = conv(substring(md5(concat_ws("|", $"source", $"doc_id")), 1, 14),
      16, 10).cast("long") % 100
    val split = docs
      .withColumn("split",
        when(bucket < 10, "test")
          .when(bucket < when($"source" === "src0", 30).otherwise(20), "val")
          .otherwise("train"))
      .select($"doc_id", $"split")
    stagedNearDupPairs(s, d)
      .join(split.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(split.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
      .select(least($"sa", $"sb").as("split_lo"),
        greatest($"sa", $"sb").as("split_hi"))
      .groupBy($"split_lo", $"split_hi")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak", $"split_lo" =!= $"split_hi")
      .orderBy($"split_lo", $"split_hi")
  }
  val q216Sql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM (SELECT doc_id,
      |          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |        FROM documents)
      |  WHERE len(t) >= 3),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |      len(list_intersect(a.s, b.s)) * 1.0
      |        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |  WHERE jaccard >= 0.6),
      |sp AS (
      |  SELECT doc_id,
      |    CASE WHEN b < 10 THEN 'test'
      |         WHEN b < (CASE WHEN source = 'src0' THEN 30 ELSE 20 END) THEN 'val'
      |         ELSE 'train' END AS split
      |  FROM (SELECT source, doc_id,
      |          ('0x' || substr(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 100 AS b
      |        FROM documents))
      |SELECT LEAST(a.split, b.split) AS split_lo,
      |  GREATEST(a.split, b.split) AS split_hi,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  LEAST(a.split, b.split) <> GREATEST(a.split, b.split) AS is_leak
      |FROM pairs
      |JOIN sp a ON a.doc_id = pairs.doc_a
      |JOIN sp b ON b.doc_id = pairs.doc_b
      |GROUP BY 1, 2
      |ORDER BY split_lo, split_hi""".stripMargin

  // --- q217: two-sample Kolmogorov–Smirnov drift test between sources ------
  // The distribution-shape companion to q202's categorical JSD and
  // q203's centroid drift: for every source pair, the KS statistic
  // D = max |F_a − F_b| over per-document token counts — the standard
  // "did this feed's length profile shift" test. Exactness: D is
  // computed ENTIRELY on integers — value-grouped counts, cumulative
  // sums per pair, numerator max|cum_a·n_b − cum_b·n_a| — with decimal
  // products (counts cross 2^53 at corpus scale) and ONE snapped
  // division at the end. The per-pair cumulative window runs over value
  // CARDINALITY (distinct lengths), not rows; sources² pairs are a
  // handful of rows.
  def q217(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val big = "decimal(38,0)"
    val counts = Tables.documents(s, d)
      .select($"source", size(tokens($"text")).cast("long").as("v"))
      .groupBy($"source", $"v").agg(count(lit(1)).as("c"))
    val tot = counts.groupBy($"source").agg(sum($"c").as("n"))
    val prs = tot.as("a").join(tot.as("b"), $"a.source" < $"b.source")
      .select($"a.source".as("pa"), $"b.source".as("pb"),
        $"a.n".as("na"), $"b.n".as("nb"))
    val ca = counts.join(broadcast(prs), $"source" === $"pa")
      .select($"pa", $"pb", $"na", $"nb", $"v", $"c".as("c_a"))
    val cb = counts.join(broadcast(prs), $"source" === $"pb")
      .select($"pa".as("pa2"), $"pb".as("pb2"), $"v".as("v2"), $"c".as("c_b"))
    val merged = ca.join(cb,
        $"pa" === $"pa2" && $"pb" === $"pb2" && $"v" === $"v2", "full_outer")
      .select(coalesce($"pa", $"pa2").as("pa"), coalesce($"pb", $"pb2").as("pb"),
        coalesce($"v", $"v2").as("v"),
        coalesce($"c_a", lit(0L)).as("c_a"), coalesce($"c_b", lit(0L)).as("c_b"))
      .join(broadcast(prs.select($"pa".as("pa3"), $"pb".as("pb3"), $"na", $"nb")),
        $"pa" === $"pa3" && $"pb" === $"pb3")
    val w = Window.partitionBy($"pa", $"pb").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, 0)
    merged
      .withColumn("cum_a", sum($"c_a").over(w))
      .withColumn("cum_b", sum($"c_b").over(w))
      .withColumn("dnum", abs($"cum_a".cast(big) * $"nb".cast(big) -
        $"cum_b".cast(big) * $"na".cast(big)))
      .groupBy($"pa".as("src_a"), $"pb".as("src_b"))
      .agg(max($"na").as("n_a"), max($"nb").as("n_b"),
        max($"dnum").as("dmax"))
      .select($"src_a", $"src_b", $"n_a", $"n_b",
        (round($"dmax".cast("double") /
            ($"n_a".cast(big) * $"n_b".cast(big)).cast("double") * 1e9)
          .cast("long").cast("double") / 1e9).as("ks_d"))
      .orderBy($"src_a", $"src_b")
  }
  val q217Sql: String =
    """WITH counts AS (
      |  SELECT source,
      |    CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
      |      AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY source),
      |prs AS (
      |  SELECT a.source AS pa, b.source AS pb, a.n AS na, b.n AS nb
      |  FROM tot a JOIN tot b ON a.source < b.source),
      |merged AS (
      |  SELECT p.pa, p.pb, p.na, p.nb, u.v,
      |    COALESCE(ca.c, 0) AS c_a, COALESCE(cb.c, 0) AS c_b
      |  FROM prs p
      |  JOIN (SELECT DISTINCT x.pa, x.pb, c.v
      |        FROM prs x JOIN counts c ON c.source IN (x.pa, x.pb)) u
      |    ON u.pa = p.pa AND u.pb = p.pb
      |  LEFT JOIN counts ca ON ca.source = p.pa AND ca.v = u.v
      |  LEFT JOIN counts cb ON cb.source = p.pb AND cb.v = u.v),
      |cums AS (
      |  SELECT pa, pb, na, nb,
      |    SUM(c_a) OVER (PARTITION BY pa, pb ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
      |    SUM(c_b) OVER (PARTITION BY pa, pb ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
      |  FROM merged)
      |SELECT pa AS src_a, pb AS src_b,
      |  CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
      |  CAST(CAST(round(CAST(MAX(abs(CAST(cum_a AS HUGEINT) * nb
      |      - CAST(cum_b AS HUGEINT) * na)) AS DOUBLE)
      |    / CAST(CAST(MAX(na) AS HUGEINT) * MAX(nb) AS DOUBLE) * 1e9) AS BIGINT)
      |    AS DOUBLE) / 1e9 AS ks_d
      |FROM cums
      |GROUP BY pa, pb
      |ORDER BY src_a, src_b""".stripMargin

  // --- q46: SimHash near-dup pairs ----------------------------------------
  // The 56-bit sketch is md5-derived (portable), and byte banding has
  // guaranteed recall at hamming ≤ 6 (pigeonhole over 7 bands), so the LSH
  // output equals a brute-force all-pairs scan — which is exactly what the
  // oracle states.
  def q46(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 3)
      .orderBy($"doc_a", $"doc_b")
  }
  val q46Sql: String =
    """WITH th AS (
      |  SELECT DISTINCT doc_id, ('0x' || substr(md5(tok), 1, 14))::BIGINT AS h
      |  FROM (SELECT doc_id,
      |          unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |        FROM documents)
      |), bits AS (
      |  SELECT doc_id, kbit,
      |    SUM(CASE WHEN (h >> kbit) & 1 = 1 THEN 1 ELSE 0 END) AS c,
      |    COUNT(*) AS n
      |  FROM th, (SELECT unnest(range(0, 56)) AS kbit) k
      |  GROUP BY doc_id, kbit
      |), sk AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN 2 * c > n THEN (CAST(1 AS BIGINT) << kbit) ELSE 0 END) AS BIGINT) AS sh
      |  FROM bits GROUP BY doc_id
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
      |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  // --- q47: winnowing fingerprint sketches (rolling-hash fingerprinting) --
  def q47(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.winnowingFingerprints(Tables.documents(s, d), "doc_id", "text", k = 4, w = 4)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("sketch_size"),
        min($"fp").as("min_fp"), max($"fp").as("max_fp"))
      .orderBy($"doc_id")
  }
  val q47Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, i AS pos,
      |    substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]), 1, 16) AS h
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i
      |        FROM toks WHERE len(t) >= 4)
      |), wm AS (
      |  SELECT doc_id,
      |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
      |                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
      |  FROM sh
      |)
      |SELECT doc_id, COUNT(DISTINCT fp) AS sketch_size,
      |  MIN(fp) AS min_fp, MAX(fp) AS max_fp
      |FROM wm GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- q79: TF-IDF — top-5 terms per document ------------------------------
  // tf from one (doc, term) aggregation, df from a term-level reduce of the
  // same frame, idf = ln(N/df) with N as an in-plan scalar. The ranking
  // orders by the ROUNDED score (both engines' ln can differ in the last
  // bit; sub-1e-6 differences collapse into the term tie-break). Two
  // shuffles total — (doc,term) then term — both on bounded-cardinality
  // keys; at 100 TB this is the canonical map-side-combine pipeline.
  def q79(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val tc = docs.select($"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      .persistTracked()
    val df = tc.groupBy($"tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tc.join(df, "tok").crossJoin(n)
      .withColumn("tfidf",
        round($"tf" * log($"n_docs".cast("double") / $"df"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"tfidf".desc, $"tok")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"doc_id", $"rank", $"tok", $"tf", $"df", $"tfidf")
      .orderBy($"doc_id", $"rank")
  }
  val q79Sql: String =
    """WITH tc AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf
      |  FROM (SELECT doc_id,
      |          unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, tok
      |), dfreq AS (
      |  SELECT tok, COUNT(*) AS df FROM tc GROUP BY tok
      |), scored AS (
      |  SELECT tc.doc_id, tc.tok, tc.tf, dfreq.df,
      |    ROUND(tc.tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / dfreq.df), 6) AS tfidf
      |  FROM tc JOIN dfreq ON tc.tok = dfreq.tok
      |)
      |SELECT doc_id, rank, tok, tf, df, tfidf FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rank
      |  FROM scored)
      |WHERE rank <= 5
      |ORDER BY doc_id, rank""".stripMargin

  // --- q82: near-dup clustering + canonical selection -----------------------
  // Connected components over the q45 pair graph (min-label propagation);
  // the component minimum is the kept document. The oracle states the same
  // closure with a recursive CTE over the same brute-force pair set.
  /** The dataset's staged near-duplicate graph: MinHash-banded pairs
    * (k=3, threshold 0.6 — the q45 parameters) and their connected-
    * component cluster table, materialized ONCE per dataset content
    * (Stage.derived, the CoPurchase/index precedent). Three consumers —
    * q82's cluster listing, q205's keep-best canonicalization, q216's
    * split-leakage audit — used to re-run banding + clustering each;
    * in production the dedup graph is an ingest-time artifact refreshed
    * with the corpus, and the staged tables hold exactly the rows the
    * inline operators produce (a parquet round-trip of long ids is
    * lossless), so every consumer's oracle hash is unchanged. q45 keeps
    * the inline operator as the banding demonstrator/benchmark. */
  private def nearDupStage(s: SparkSession, d: String): java.nio.file.Path =
    graft.Stage.derived("neardup_clusters", d) { p =>
      val pairs = Dedup.nearDuplicatePairs(Tables.documents(s, d),
        "doc_id", "text", k = 3, threshold = 0.6, eagerSkewProbe = true)
      pairs.write.mode("overwrite").parquet(s"$p/pairs.parquet")
      Dedup.clusterPairs(s.read.parquet(s"$p/pairs.parquet"))
        .write.mode("overwrite").parquet(s"$p/clusters.parquet")
    }

  private def stagedNearDupPairs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${nearDupStage(s, d)}/pairs.parquet")

  private def stagedClusters(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${nearDupStage(s, d)}/clusters.parquet")

  def q82(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    stagedClusters(s, d).orderBy($"doc_id")
  }
  // MATERIALIZED hints: without them DuckDB re-inlines the brute-force
  // pair join into every recursion step of `reach` (quadratic work per
  // iteration — the sf0.1 check ran 45+ min; materialized it's minutes).
  val q82Sql: String =
    """WITH RECURSIVE sh AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM (SELECT doc_id,
      |          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |        FROM documents)
      |  WHERE len(t) >= 3
      |), pairs AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |      len(list_intersect(a.s, b.s)) * 1.0
      |        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |  WHERE jaccard >= 0.6
      |), edges AS MATERIALIZED (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |), reach AS (
      |  SELECT src AS doc_id, dst AS r FROM edges
      |  UNION
      |  SELECT reach.doc_id, edges.dst FROM reach JOIN edges ON reach.r = edges.src
      |)
      |SELECT doc_id, cluster_rep, doc_id = cluster_rep AS is_canonical FROM (
      |  SELECT doc_id, LEAST(doc_id, MIN(r)) AS cluster_rep
      |  FROM reach GROUP BY doc_id)
      |ORDER BY doc_id""".stripMargin

  // --- q205: near-dup cluster canonicalization (keep-best selection) -------
  // The DECISION step after q82's clustering: inside every near-duplicate
  // cluster keep exactly one document — the longest (n_chars), ties to
  // the smallest id — and account for what the cut removes. This is the
  // "keep one per cluster" pass every dedup pipeline ends with (MinHash
  // finds the clusters; something still has to pick the survivor), with
  // a quality criterion instead of q82's structural min-id
  // representative. The argmax is a min(struct(-n_chars, doc_id))
  // one-row reduction per cluster; everything downstream of the proven
  // clustering is cluster-count-sized. Exact integers end-to-end. The
  // oracle recomputes the components brute-force (q82's recursive CTE)
  // and the same argmax, so a single misassigned member or wrong
  // survivor hash-misses.
  def q205(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    stagedClusters(s, d)
      .join(docs.select($"doc_id", $"n_chars"), "doc_id")
      .groupBy($"cluster_rep".as("cluster"))
      .agg(count(lit(1)).as("n_members"),
        min(struct((-$"n_chars").as("neg"), $"doc_id".as("id"))).as("k"),
        sum($"n_chars").as("total_chars"))
      .select($"cluster", $"n_members", $"k.id".as("keep_doc"),
        (-$"k.neg").as("keep_chars"),
        ($"total_chars" + $"k.neg").as("chars_removed"))
      .orderBy($"cluster")
  }
  val q205Sql: String =
    """WITH RECURSIVE sh AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM (SELECT doc_id,
      |          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |        FROM documents)
      |  WHERE len(t) >= 3
      |), pairs AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |      len(list_intersect(a.s, b.s)) * 1.0
      |        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |  WHERE jaccard >= 0.6
      |), edges AS MATERIALIZED (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |), reach AS (
      |  SELECT src AS doc_id, dst AS r FROM edges
      |  UNION
      |  SELECT reach.doc_id, edges.dst FROM reach JOIN edges ON reach.r = edges.src
      |), comp AS (
      |  SELECT doc_id, LEAST(doc_id, MIN(r)) AS cluster
      |  FROM reach GROUP BY doc_id
      |), ranked AS (
      |  SELECT c.cluster, c.doc_id, d.n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY c.cluster
      |      ORDER BY d.n_chars DESC, c.doc_id) AS rn
      |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
      |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
      |  CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keep_doc,
      |  CAST(MIN(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS keep_chars,
      |  CAST(SUM(n_chars) - MIN(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
      |    AS chars_removed
      |FROM ranked
      |GROUP BY cluster
      |ORDER BY cluster""".stripMargin

  // --- q206: token-budget mix allocation (the data-mix planner) -------------
  // q140 computes the temperature weights; this query EXECUTES them: given
  // a total token budget, each language gets floor(budget·w9/1e9) tokens
  // (exact integer arithmetic — w9·budget ≪ 2^53), and within a language
  // documents are admitted greedily in (n_chars desc, doc_id) order while
  // the running token total stays inside the allocation — the concrete
  // "which documents make the next training mix" decision. The running
  // total is a per-language window cumsum; at 100 TB a skewed giant
  // language would route through q192's sliced-prefix form instead of a
  // single-partition sort, the documented swap. Exact integers
  // end-to-end; per-language report of budget vs docs/tokens admitted.
  def q206(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val budget = 50000L
    val docs = Tables.documents(s, d).select($"doc_id", $"lang", $"n_chars",
      size(tokens($"text")).cast("long").as("n_tokens"))
    val c = docs.groupBy($"lang").agg(count(lit(1)).as("n_docs"))
    val p = c.withColumn("pa", round(pow($"n_docs".cast("double"), lit(0.3)), 6))
    val t = p.agg(sum($"pa".cast("decimal(18,6)")).as("tot_pa"))
    val budgets = p.crossJoin(broadcast(t))
      .withColumn("w9",
        round($"pa" / $"tot_pa".cast("double") * lit(1e9)).cast("long"))
      .select($"lang", expr(s"(w9 * $budget) div 1000000000").as("budget_tokens"))
    val w = Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.join(broadcast(budgets), "lang")
      .withColumn("cum", sum($"n_tokens").over(w))
      .filter($"cum" <= $"budget_tokens")
      .groupBy($"lang")
      .agg(max($"budget_tokens").as("budget_tokens"),
        count(lit(1)).as("docs_admitted"),
        sum($"n_tokens").as("tokens_admitted"))
      .orderBy($"lang")
  }
  val q206Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM docs GROUP BY lang),
      |p AS (SELECT lang, ROUND(pow(CAST(n_docs AS DOUBLE), 0.3), 6) AS pa FROM c),
      |t AS (SELECT SUM(CAST(pa AS DECIMAL(18,6))) AS tot_pa FROM p),
      |b AS (
      |  SELECT lang,
      |    (CAST(round(pa / CAST(tot_pa AS DOUBLE) * 1e9) AS BIGINT) * 50000)
      |      // 1000000000 AS budget_tokens
      |  FROM p CROSS JOIN t),
      |adm AS (
      |  SELECT d.lang, d.n_tokens, b.budget_tokens,
      |    SUM(d.n_tokens) OVER (PARTITION BY d.lang
      |      ORDER BY d.n_chars DESC, d.doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM docs d JOIN b ON b.lang = d.lang)
      |SELECT lang, CAST(MAX(budget_tokens) AS BIGINT) AS budget_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS docs_admitted,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_admitted
      |FROM adm
      |WHERE cum <= budget_tokens
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // --- q83: word-n-gram Jaccard similarity join (prefix filtering) ---------
  // Lossless PPJoin-style prefix filter (Dedup.ngramJaccardJoin) — recall
  // is a theorem, so the brute-force all-pairs oracle matches exactly. The
  // jaccard value itself is a ratio of small ints (exact in IEEE double on
  // both engines), so no decimal routing is needed. Same similarity
  // semantics as q45's MinHash-LSH route — two independent algorithms,
  // both checked against the same brute-force answer.
  def q83(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.ngramJaccardJoin(Tables.documents(s, d), "doc_id", "text",
      n = 3, threshold = 0.6, eagerSkewProbe = true)
      .orderBy($"doc_a", $"doc_b")
  }
  val q83Sql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM (SELECT doc_id,
      |          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |        FROM documents)
      |  WHERE len(t) >= 3
      |)
      |SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.s, b.s)) * 1.0
      |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |    AND len(b.s) >= 0.6 * len(a.s) AND len(a.s) >= 0.6 * len(b.s))
      |WHERE jaccard >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  // --- q84: BPE-ish regex tokenization stats --------------------------------
  // GPT-2-style space-prefixed segmentation, restated with an RE2-safe
  // pattern (no lookahead — Java regex and DuckDB's RE2 only agree on
  // leftmost behavior when the alternatives' character classes are
  // disjoint, which they are over the single-spaced normalized text).
  private val bpePattern = " ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"
  def q84(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", normalizeText($"text").as("norm"))
      .select($"doc_id",
        regexp_extract_all($"norm", lit(bpePattern), lit(0)).as("bpe"),
        size(split($"norm", " ")).as("n_ws_tokens"),
        length($"norm").as("n_chars"))
      .select($"doc_id",
        size($"bpe").as("n_bpe_tokens"),
        size(array_distinct($"bpe")).as("n_bpe_distinct"),
        aggregate($"bpe", lit(0), (acc, t) => acc + length(t)).as("bpe_chars"),
        $"n_ws_tokens", $"n_chars")
      .orderBy($"doc_id")
  }
  val q84Sql: String =
    """SELECT doc_id,
      |  len(bpe) AS n_bpe_tokens,
      |  len(list_distinct(bpe)) AS n_bpe_distinct,
      |  CAST(list_sum(list_transform(bpe, t -> length(t))) AS INT) AS bpe_chars,
      |  len(string_split(norm, ' ')) AS n_ws_tokens,
      |  length(norm) AS n_chars
      |FROM (
      |  SELECT doc_id, norm,
      |    regexp_extract_all(norm, ' ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+') AS bpe
      |  FROM (SELECT doc_id,
      |          lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  // --- q88: sequence packing (concat-and-chunk into fixed token bins) ------
  // The training-data packing step: documents are concatenated in a
  // deterministic order and cut every C tokens; each doc's bin span falls
  // out of a running token-count window. Partitioned by source — the
  // scalable shape (per-stream cumsum; a single global ordered window would
  // serialize at 100 TB; cross-partition offsets would come from a tiny
  // per-partition-totals prefix sum instead).
  def q88(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val C = 2048
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select($"source", $"doc_id", size(tokens($"text")).as("n_tokens"))
      .withColumn("start_off", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .select($"source", $"doc_id", $"n_tokens", $"start_off",
        ($"start_off" / C).cast("long").as("start_bin"),
        (($"start_off" + $"n_tokens" - 1) / C).cast("long").as("end_bin"))
      .filter($"n_tokens" > 0)
      .orderBy($"source", $"doc_id")
  }
  val q88Sql: String =
    """SELECT source, doc_id, n_tokens, start_off,
      |  start_off // 2048 AS start_bin,
      |  (start_off + n_tokens - 1) // 2048 AS end_bin
      |FROM (
      |  SELECT source, doc_id, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
      |  FROM (SELECT source, doc_id,
      |          len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS n_tokens
      |        FROM documents))
      |WHERE n_tokens > 0
      |ORDER BY source, doc_id""".stripMargin

  // --- q89: deterministic stratified train/val/test split -------------------
  // Portable-hash split (md5 prefix mod 100, the q76 sampling trick) with
  // per-source validation rates — reproducible on any engine, no seed, no
  // shuffle beyond the final count. The split column is what a training
  // pipeline partitions its output by.
  def q89(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bucket = conv(substring(md5(concat_ws("|", $"source", $"doc_id")), 1, 14), 16, 10)
      .cast("long") % 100
    Tables.documents(s, d)
      .withColumn("split",
        when(bucket < 10, "test")
          .when(bucket < when($"source" === "src0", 30).otherwise(20), "val")
          .otherwise("train"))
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"source", $"split")
  }
  val q89Sql: String =
    """SELECT source, split, COUNT(*) AS n_docs
      |FROM (
      |  SELECT source,
      |    CASE WHEN b < 10 THEN 'test'
      |         WHEN b < (CASE WHEN source = 'src0' THEN 30 ELSE 20 END) THEN 'val'
      |         ELSE 'train' END AS split
      |  FROM (SELECT source, doc_id,
      |          ('0x' || substr(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 100 AS b
      |        FROM documents))
      |GROUP BY source, split
      |ORDER BY source, split""".stripMargin

  // --- q90: count-min sketch heavy hitters ----------------------------------
  // The streaming/mergeable heavy-hitters sketch: d=4 portable md5 hash
  // rows x w=8192 buckets, counts from ONE (row, bucket) aggregation over
  // token occurrences (map-side combinable, mergeable across partitions by
  // construction — the 100 TB shape). The estimate min_i cms[i][h_i(tok)]
  // is fully deterministic given the hash functions, so unlike HLL/GK the
  // sketch VALUES hash-match the oracle, not just a bound flag. Output:
  // top-20 exact tokens with their CMS estimates and the (always >= 0)
  // overestimate.
  def q90(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val D = 4
    val W = 8192L
    def bucket(row: Int, tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(row.toString), lit("|"), tok)), 1, 14), 16, 10)
        .cast("long") % W
    // both the sketch build and the exact top-k read the token stream;
    // persist so the regex tokenize runs once
    val toks = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("tok"))
      .persistTracked()
    val cms = toks
      .select(explode(array((0 until D).map(i =>
        struct(lit(i).as("r"), bucket(i, $"tok").as("b"))): _*)).as("rb"))
      .groupBy($"rb.r".as("r"), $"rb.b".as("b"))
      .agg(count(lit(1)).as("c"))
    val top = toks.groupBy($"tok").agg(count(lit(1)).as("exact_n"))
      .orderBy($"exact_n".desc, $"tok").limit(20)
    top
      .select($"tok", $"exact_n",
        explode(array((0 until D).map(i =>
          struct(lit(i).as("r"), bucket(i, $"tok").as("b"))): _*)).as("rb"))
      .join(cms, $"rb.r" === cms("r") && $"rb.b" === cms("b"))
      .groupBy($"tok", $"exact_n")
      .agg(min($"c").as("cms_est"))
      .select($"tok", $"exact_n", $"cms_est",
        ($"cms_est" - $"exact_n").as("overestimate"))
      .orderBy($"exact_n".desc, $"tok")
  }
  val q90Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |  FROM documents
      |), cms AS (
      |  SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || tok), 1, 14))::BIGINT % 8192 AS b,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM toks, (SELECT unnest(range(0, 4)) AS r) rows
      |  GROUP BY 1, 2
      |), top AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n
      |  FROM toks GROUP BY tok
      |  ORDER BY exact_n DESC, tok LIMIT 20
      |)
      |, probes AS (
      |  SELECT top.tok, top.exact_n, rows.r,
      |    ('0x' || substr(md5(CAST(rows.r AS VARCHAR) || '|' || top.tok), 1, 14))::BIGINT % 8192 AS b
      |  FROM top, (SELECT unnest(range(0, 4)) AS r) rows
      |)
      |SELECT probes.tok, probes.exact_n,
      |  CAST(MIN(cms.c) AS BIGINT) AS cms_est,
      |  CAST(MIN(cms.c) - probes.exact_n AS BIGINT) AS overestimate
      |FROM probes JOIN cms ON cms.r = probes.r AND cms.b = probes.b
      |GROUP BY probes.tok, probes.exact_n
      |ORDER BY exact_n DESC, tok""".stripMargin

  // --- q91: weighted corpus sampling (data mixing) --------------------------
  // The corpus-mixing step: sample a fixed budget of documents with
  // per-source oversampling weights, deterministically (no seed) via the
  // exponential race (Efraimidis-Spirakis A-ES): priority = -ln(u)/w with u
  // a portable md5-hash uniform in (0,1); the k smallest priorities win —
  // P[selected] scales with w, replay-stable, and a single top-k instead of
  // per-source passes. Rank on the ROUNDED priority with doc_id tie-break:
  // both engines' ln agree far beyond 6 decimals (q79's proven pattern).
  // One scan + one top-k — no shuffle proportional to the corpus.
  def q91(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 100
    val u = (conv(substring(md5(concat(lit("mix|"), $"doc_id")), 1, 14), 16, 10)
      .cast("double") + 0.5) / lit(Math.pow(2.0, 56))
    val wgt = when($"source".isin("src0", "src1"), 3.0).otherwise(1.0)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"priority", $"doc_id")
    Tables.documents(s, d)
      .select($"doc_id", $"source",
        round(-log(u) / wgt, 6).as("priority"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"doc_id", $"source", $"priority", $"rk")
      .orderBy($"rk")
  }
  val q91Sql: String =
    """SELECT doc_id, source, priority, rk FROM (
      |  SELECT doc_id, source, priority,
      |    ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS rk
      |  FROM (
      |    SELECT doc_id, source,
      |      ROUND(-ln((('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT + 0.5)
      |                / 72057594037927936.0)
      |            / (CASE WHEN source IN ('src0','src1') THEN 3.0 ELSE 1.0 END), 6) AS priority
      |    FROM documents))
      |WHERE rk <= 100
      |ORDER BY rk""".stripMargin

  // --- q35: benchmark decontamination (n-gram overlap vs holdout) ----------
  // The standard pre-training hygiene check: corpus docs sharing any word
  // 3-gram with a held-out eval set are flagged with their hit fraction.
  // The "benchmark" here is the deterministic doc_id%10==0 slice, so the
  // oracle can restate the split exactly. Holdout grams broadcast (eval
  // sets are tiny next to the corpus); the only shuffle is the per-doc
  // count on doc_id.
  def q35(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    graft.operators.Decontaminate.ngramOverlap(
      docs.filter($"doc_id" % 10 =!= 0), docs.filter($"doc_id" % 10 === 0),
      "doc_id", "text", n = 3)
      .orderBy($"doc_id")
  }
  val q35Sql: String =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
      |    i -> substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 16)))) AS g
      |  FROM (SELECT doc_id,
      |          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |        FROM documents)
      |  WHERE len(t) >= 3
      |), hold AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 0),
      |corp AS (SELECT doc_id, g FROM g WHERE doc_id % 10 <> 0)
      |SELECT c.doc_id, COUNT(*) AS n_grams, COUNT(h.g) AS n_hits,
      |  COUNT(h.g) / COUNT(*) AS hit_frac
      |FROM corp c LEFT JOIN hold h ON c.g = h.g
      |GROUP BY c.doc_id
      |HAVING COUNT(h.g) > 0
      |ORDER BY doc_id""".stripMargin

  // --- q36: intra-document repetition ratio ---------------------------------
  // Degenerate-generation / boilerplate detector: the fraction of a doc's
  // word 3-grams that are repeats. Gram rows come from the codegen lead()
  // shingler; one shuffle on doc_id for the count + count-distinct.
  def q36(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tokRows = Tables.documents(s, d).select($"doc_id",
      posexplode(tokens($"text")).as(Seq("pos", "tok")))
    val wOrd = Window.partitionBy($"doc_id").orderBy($"pos")
    val grams = tokRows
      .withColumn("t1", lead($"tok", 1).over(wOrd))
      .withColumn("t2", lead($"tok", 2).over(wOrd))
      .filter($"t2".isNotNull)
      .select($"doc_id", concat_ws(" ", $"tok", $"t1", $"t2").as("g"))
    grams.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"), count_distinct($"g").as("n_distinct"))
      .withColumn("rep_ratio", ($"n_grams" - $"n_distinct") / $"n_grams")
      .orderBy($"doc_id")
  }
  val q36Sql: String =
    """SELECT doc_id, len(l) AS n_grams, len(list_distinct(l)) AS n_distinct,
      |  (len(l) - len(list_distinct(l))) / len(l) AS rep_ratio
      |FROM (
      |  SELECT doc_id, list_transform(range(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS l
      |  FROM (SELECT doc_id,
      |          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |        FROM documents)
      |  WHERE len(t) >= 3)
      |ORDER BY doc_id""".stripMargin

  // --- q37: PII detection + redaction ---------------------------------------
  // The synthetic corpus carries no PII, so the query injects a
  // deterministic email run (doc_id%3 copies) and one IPv4 per doc — the
  // same expression is stated in the oracle, so the regex machinery
  // (counts AND the redacted text itself, via md5) is what's checked.
  def q37(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.operators.Pii
    val aug = Tables.documents(s, d).withColumn("aug", concat($"text",
      repeat(concat(lit(" user"), $"doc_id".cast("string"), lit("@example.com")),
        ($"doc_id" % 3).cast("int")),
      lit(" from 10.0."), ($"doc_id" % 200).cast("string"), lit("."),
      ($"doc_id" % 250).cast("string")))
    aug.select($"doc_id",
      Pii.emailCount($"aug").as("n_emails"),
      Pii.ipCount($"aug").as("n_ips"),
      md5(Pii.redact($"aug")).as("red_fp"))
      .orderBy($"doc_id")
  }
  val q37Sql: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
      |  len(regexp_extract_all(aug, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
      |  md5(regexp_replace(
      |    regexp_replace(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g')) AS red_fp
      |FROM (
      |  SELECT doc_id,
      |    text || repeat(' user' || CAST(doc_id AS VARCHAR) || '@example.com',
      |                   CAST(doc_id % 3 AS INT))
      |         || ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR)
      |         || '.' || CAST(doc_id % 250 AS VARCHAR) AS aug
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // --- q38: corpus vocabulary statistics per source -------------------------
  // The Heaps-law corpus profile a data-mixing pipeline reads before
  // weighting sources: total tokens, distinct vocabulary, and corpus-level
  // type-token ratio per source. One count+count-distinct aggregation —
  // Spark plans the distinct as a two-phase expand, partial-combined
  // map-side, so the shuffle carries (source, token) partials, not rows.
  def q38(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("tok"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_tokens"), count_distinct($"tok").as("n_vocab"))
      .withColumn("ttr", $"n_vocab" / $"n_tokens")
      .orderBy($"source")
  }
  val q38Sql: String =
    """SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_vocab,
      |  COUNT(DISTINCT tok) / COUNT(*) AS ttr
      |FROM (
      |  SELECT source,
      |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |  FROM documents)
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --- q39: unigram-LM surprisal scoring ------------------------------------
  // The cheapest perplexity proxy a curation pipeline runs: fit a unigram
  // LM on the corpus itself (token frequencies), score each document by its
  // mean token surprisal -ln(p(tok)). Low-surprisal docs are boilerplate /
  // repetitive; high-surprisal docs are rare-token noise — both ends get
  // clipped in practice.
  //
  // Determinism across engines: ln() may differ by 1 ulp between libm and
  // java.lang.Math, so each token's surprisal is rounded to 4 decimals
  // BEFORE aggregating; from there everything is exact INTEGER arithmetic
  // in 1e-4 units — sum of longs, integer division by the token count,
  // one final exact double division by 10000.0. A decimal-sum-then-
  // ROUND(sum/n, 4) variant is NOT safe: the 1e-4-grid sum divided by an
  // integer lands exactly on round-4 half-way ties (observed live at
  // sf0.1), and the engines break ties differently.
  //
  // Scale: the vocabulary table (token → count) is tiny relative to the
  // corpus (Heaps' law), so the score join broadcasts; the only full-data
  // shuffles are the vocab count and the per-doc aggregation.
  def q39(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
    val tot = vocab.agg(sum($"c").as("n_total"))
    val scored = vocab.crossJoin(broadcast(tot))
      .withColumn("surprisal", round(-log($"c" * lit(1.0) / $"n_total"), 4))
      .select($"tok", $"surprisal")
    toks.join(broadcast(scored), "tok")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(round($"surprisal" * 10000).cast("long")).as("se4"))
      .withColumn("avg_surprisal", expr("se4 div n_tokens") / 10000.0)
      .select($"doc_id", $"n_tokens", $"avg_surprisal")
      .orderBy($"doc_id")
  }
  val q39Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |  FROM documents
      |), vocab AS (
      |  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
      |), tot AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM vocab
      |), scored AS (
      |  SELECT tok, ROUND(-ln(c * 1.0 / n_total), 4) AS surprisal FROM vocab, tot
      |)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  (CAST(SUM(CAST(ROUND(surprisal * 10000, 0) AS BIGINT)) AS BIGINT) // COUNT(*))
      |    / 10000.0 AS avg_surprisal
      |FROM toks JOIN scored USING (tok)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // --- q48: exact duplicate-span detection (substring-dedup shape) ----------
  // The positional form of exact substring dedup (Lee et al. 2022, "Dedup-
  // licating Training Data Makes Language Models Better", arXiv:2107.06499 —
  // their suffix-array pass re-expressed relationally): every 5-token span
  // is fingerprinted WITH its position; a span duplicated across ≥2 distinct
  // documents marks both documents' positions as repeated training signal.
  // Per doc we report how much of it is covered by cross-document spans and
  // where the first one starts — the decision inputs for span-level removal.
  //
  // Scale: grams shuffle once on the 16-hex-char fingerprint (bounded key,
  // uniform by construction), the flag join shuffles on the same key (the
  // exchange is reused), and the final per-doc rollup shuffles on doc_id.
  // No all-pairs product anywhere — cost is linear in corpus grams, which
  // is how the suffix-array approach scales too.
  def q48(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.duplicateSpanStats(Tables.documents(s, d), "doc_id", "text", k = 5)
      .orderBy($"doc_id")
  }
  val q48Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, i AS pos,
      |    substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]),
      |           1, 16) AS fp
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i
      |        FROM toks WHERE len(t) >= 5)
      |), dupfps AS (
      |  SELECT fp FROM grams GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
      |), flagged AS (
      |  SELECT g.doc_id, g.pos, CASE WHEN d.fp IS NULL THEN 0 ELSE 1 END AS is_dup
      |  FROM grams g LEFT JOIN dupfps d ON g.fp = d.fp
      |)
      |SELECT doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(is_dup) AS BIGINT) AS n_dup_grams,
      |  SUM(is_dup) * 1.0 / COUNT(*) AS dup_ratio,
      |  MIN(CASE WHEN is_dup = 1 THEN pos END) AS first_dup_pos
      |FROM flagged
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // --- q59: URL extraction + per-domain rollup ------------------------------
  // The web-corpus curation primitive: pull every URL out of the text,
  // normalize to its host, and roll up per-domain volume — the input to
  // domain-level allow/block lists and per-site sampling caps. The corpus
  // carries no URLs, so (as with q37's PII) each doc gets deterministic
  // injected URLs from its doc_id; the regex extraction machinery is what
  // the oracle checks. Patterns are RE2-safe (no backtracking constructs),
  // portable between Java regex and DuckDB.
  //
  // Scale: regexp_extract_all + explode is generator-shaped per-row work
  // (no shuffle); the only shuffle is the per-domain count — bounded by the
  // domain population, the classic heavy-hitter rollup.
  def q59(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val aug = Tables.documents(s, d).withColumn("aug", concat($"text",
      lit(" see https://site"), ($"doc_id" % 7).cast("string"),
      lit(".example.org/page/"), ($"doc_id" % 5).cast("string"),
      lit(" and https://cdn"), ($"doc_id" % 3).cast("string"),
      lit(".example.net/x")))
    aug
      .select($"doc_id", explode(regexp_extract_all($"aug",
        lit("https://[a-z0-9.-]+/[a-z0-9/]*"), lit(0))).as("url"))
      .withColumn("domain", regexp_extract($"url", "https://([a-z0-9.-]+)/", 1))
      .groupBy($"domain")
      .agg(count(lit(1)).as("n_urls"),
        count_distinct($"doc_id").as("n_docs"),
        min($"url").as("sample_url"))
      .orderBy($"domain")
  }
  val q59Sql: String =
    """WITH aug AS (
      |  SELECT doc_id,
      |    text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
      |         || '.example.org/page/' || CAST(doc_id % 5 AS VARCHAR)
      |         || ' and https://cdn' || CAST(doc_id % 3 AS VARCHAR)
      |         || '.example.net/x' AS aug
      |  FROM documents
      |), urls AS (
      |  SELECT doc_id,
      |    unnest(regexp_extract_all(aug, 'https://[a-z0-9.-]+/[a-z0-9/]*')) AS url
      |  FROM aug
      |)
      |SELECT regexp_extract(url, 'https://([a-z0-9.-]+)/', 1) AS domain,
      |  COUNT(*) AS n_urls,
      |  COUNT(DISTINCT doc_id) AS n_docs,
      |  MIN(url) AS sample_url
      |FROM urls
      |GROUP BY 1
      |ORDER BY domain""".stripMargin

  // --- q93: deterministic corpus shuffle (shard + position) -----------------
  // The global-shuffle step a training pipeline runs last: every document
  // gets a portable pseudorandom key (md5 — reproducible on any engine, no
  // seed state), a shard by key mod S, and a dense position within its
  // shard by key order. One shuffle on shard + an in-partition sort; at
  // 100 TB each shard is written as its own file set and the position is
  // the byte-offset-free global order readers stream in.
  def q93(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nShards = 8
    val key = conv(substring(md5(concat_ws("|", lit("shuf"), $"doc_id")), 1, 14), 16, 10)
      .cast("long")
    Tables.documents(s, d)
      .withColumn("k", key)
      .withColumn("shard", ($"k" % nShards).cast("int"))
      .withColumn("pos",
        row_number().over(Window.partitionBy($"shard").orderBy($"k", $"doc_id")) - 1)
      .select($"doc_id", $"shard", $"pos")
      .orderBy($"shard", $"pos")
  }
  val q93Sql: String =
    """SELECT doc_id, CAST(k % 8 AS INT) AS shard,
      |  ROW_NUMBER() OVER (PARTITION BY k % 8 ORDER BY k, doc_id) - 1 AS pos
      |FROM (SELECT doc_id,
      |        ('0x' || substr(md5('shuf|' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS k
      |      FROM documents)
      |ORDER BY shard, pos""".stripMargin

  // --- q94: curation funnel — every tagger composed, per-source counts ------
  // The report a corpus-curation pipeline publishes: how many documents
  // each filter flags (short, low-quality, wrong-language, repetitive,
  // exact-duplicate) and how many survive all of them, per source. The
  // flags reuse the exact formulas of q41/q42/q36/q43, so this is the
  // end-to-end composition check over the tagger family: one narrow
  // expression pass + a fingerprint window + a doc-keyed gram aggregate,
  // joined on doc_id — three shuffles total regardless of corpus size.
  def q94(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stop = Seq("the", "a", "of", "and", "in", "to")
    val withToks = Tables.documents(s, d).withColumn("toks", tokens($"text"))
    val scored = markers.foldLeft(withToks) { case (df, (l, ws)) =>
      df.withColumn(s"s_$l", size(filter($"toks", t => t.isInCollection(ws))))
    }
    val base = scored
      .withColumn("n_tokens", size($"toks"))
      .filter($"n_tokens" > 0)
      .withColumn("stop_ratio",
        size(filter($"toks", t => t.isInCollection(stop))) * lit(1.0) / $"n_tokens")
      .withColumn("ttr", size(array_distinct($"toks")) * lit(1.0) / $"n_tokens")
      .withColumn("len_score", least($"n_tokens" * lit(1.0) / 64.0, lit(1.0)))
      .withColumn("quality_score",
        round($"len_score" * 0.4 + $"ttr" * 0.4 +
          least($"stop_ratio" * 4.0, lit(1.0)) * 0.2, 6))
      .withColumn("lang_pred",
        when($"s_en" >= $"s_es" && $"s_en" >= $"s_de" && $"s_en" >= $"s_fr", "en")
          .when($"s_es" >= $"s_de" && $"s_es" >= $"s_fr", "es")
          .when($"s_de" >= $"s_fr", "de")
          .otherwise("fr"))
      .withColumn("fp", fingerprint($"text"))
      .withColumn("dup_rn",
        row_number().over(Window.partitionBy($"fp").orderBy($"doc_id")))
    val tokRows = Tables.documents(s, d).select($"doc_id",
      posexplode(tokens($"text")).as(Seq("pos", "tok")))
    val wOrd = Window.partitionBy($"doc_id").orderBy($"pos")
    val rep = tokRows
      .withColumn("t1", lead($"tok", 1).over(wOrd))
      .withColumn("t2", lead($"tok", 2).over(wOrd))
      .filter($"t2".isNotNull)
      .select($"doc_id", concat_ws(" ", $"tok", $"t1", $"t2").as("g"))
      .groupBy($"doc_id")
      .agg(((count(lit(1)) - count_distinct($"g")) * lit(1.0) / count(lit(1)))
        .as("rep_ratio"))
    val flagged = base.join(rep, Seq("doc_id"), "left")
      .withColumn("f_short", when($"n_tokens" < 16, 1).otherwise(0))
      .withColumn("f_lowq", when($"quality_score" < 0.5, 1).otherwise(0))
      .withColumn("f_lang", when($"lang_pred" =!= $"lang", 1).otherwise(0))
      .withColumn("f_rep", when(coalesce($"rep_ratio", lit(0.0)) > 0.02, 1).otherwise(0))
      .withColumn("f_dup", when($"dup_rn" > 1, 1).otherwise(0))
    flagged.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"f_short").as("n_short"),
        sum($"f_lowq").as("n_lowq"),
        sum($"f_lang").as("n_lang_mismatch"),
        sum($"f_rep").as("n_repetitive"),
        sum($"f_dup").as("n_dup"),
        sum(when($"f_short" + $"f_lowq" + $"f_lang" + $"f_rep" + $"f_dup" === 0, 1)
          .otherwise(0)).as("n_kept"))
      .orderBy($"source")
  }
  val q94Sql: String =
    """WITH base AS (
      |  SELECT doc_id, source, lang, md5(norm) AS fp,
      |    len(t) AS n_tokens,
      |    len(list_distinct(t)) * 1.0 / len(t) AS ttr,
      |    len(list_filter(t, x -> x IN ('the','a','of','and','in','to'))) * 1.0 / len(t) AS stop_ratio,
      |    LEAST(len(t) * 1.0 / 64.0, 1.0) AS len_score,
      |    len(list_filter(t, x -> x IN ('the','a','and','of'))) AS s_en,
      |    len(list_filter(t, x -> x IN ('el','la','de','y'))) AS s_es,
      |    len(list_filter(t, x -> x IN ('der','die','und','das'))) AS s_de,
      |    len(list_filter(t, x -> x IN ('le','les','et','une'))) AS s_fr
      |  FROM (SELECT doc_id, source, lang, norm, string_split(norm, ' ') AS t
      |        FROM (SELECT doc_id, source, lang,
      |                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
      |              FROM documents))
      |  WHERE len(t) > 0
      |), rep AS (
      |  SELECT doc_id, (len(l) - len(list_distinct(l))) * 1.0 / len(l) AS rep_ratio
      |  FROM (SELECT doc_id, list_transform(range(1, len(t) - 1),
      |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS l
      |        FROM (SELECT doc_id,
      |                string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |              FROM documents)
      |        WHERE len(t) >= 3)
      |), flagged AS (
      |  SELECT b.source,
      |    CASE WHEN b.n_tokens < 16 THEN 1 ELSE 0 END AS f_short,
      |    CASE WHEN ROUND(b.len_score * 0.4 + b.ttr * 0.4
      |              + LEAST(b.stop_ratio * 4.0, 1.0) * 0.2, 6) < 0.5 THEN 1 ELSE 0 END AS f_lowq,
      |    CASE WHEN (CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
      |                    WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
      |                    WHEN s_de >= s_fr THEN 'de'
      |                    ELSE 'fr' END) <> b.lang THEN 1 ELSE 0 END AS f_lang,
      |    CASE WHEN COALESCE(r.rep_ratio, 0) > 0.02 THEN 1 ELSE 0 END AS f_rep,
      |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY b.fp ORDER BY b.doc_id) > 1
      |         THEN 1 ELSE 0 END AS f_dup
      |  FROM base b LEFT JOIN rep r USING (doc_id)
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(f_short) AS BIGINT) AS n_short,
      |  CAST(SUM(f_lowq) AS BIGINT) AS n_lowq,
      |  CAST(SUM(f_lang) AS BIGINT) AS n_lang_mismatch,
      |  CAST(SUM(f_rep) AS BIGINT) AS n_repetitive,
      |  CAST(SUM(f_dup) AS BIGINT) AS n_dup,
      |  CAST(SUM(CASE WHEN f_short + f_lowq + f_lang + f_rep + f_dup = 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM flagged
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --- q96: deterministic weighted interleave (data mixing) -----------------
  // The pretraining-mix scheduler: given per-source weights (src0 gets 3x),
  // emit a global training order in which any prefix holds sources in
  // weight proportion. Stride scheduling with exact integers: docs rank
  // within their source by portable md5 hash, virtual time = rank *
  // (K / weight) with K a common multiple, global order by (vt, source,
  // rank) — no doubles, so the order is bit-identical on any engine. Two
  // shuffles (per-source rank, global order); at scale the global sort is
  // the same range-partitioned write a shuffled corpus needs anyway.
  def q96(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key = conv(substring(md5(concat_ws("|", lit("mix"), $"doc_id")), 1, 14), 16, 10)
      .cast("long")
    val weighted = Tables.documents(s, d)
      .withColumn("k", key)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy($"k", $"doc_id")))
      .withColumn("vt", $"rn" * when($"source" === "src0", 1L).otherwise(3L))
    // limit FIRST (TakeOrderedAndProject — per-partition top-k, no global
    // sort), then number the 200 survivors; (vt, source, rn) is a unique
    // total order, so limit-then-number == number-then-limit.
    weighted
      .orderBy($"vt", $"source", $"rn")
      .limit(200)
      .withColumn("pos", row_number().over(
        Window.orderBy($"vt", $"source", $"rn")) - 1)
      .select($"pos", $"doc_id", $"source", $"rn", $"vt")
      .orderBy($"pos")
  }
  val q96Sql: String =
    """SELECT ROW_NUMBER() OVER (ORDER BY vt, source, rn) - 1 AS pos,
      |  doc_id, source, rn, vt
      |FROM (
      |  SELECT doc_id, source, rn,
      |    rn * (CASE WHEN source = 'src0' THEN 1 ELSE 3 END) AS vt
      |  FROM (
      |    SELECT doc_id, source,
      |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY k, doc_id) AS rn
      |    FROM (SELECT doc_id, source,
      |            ('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS k
      |          FROM documents)))
      |ORDER BY pos
      |LIMIT 200""".stripMargin

  // --- q103: per-source cap sampling (domain capping) -----------------------
  // The C4/RefinedWeb-style domain cap: keep at most N documents per
  // source, chosen by a portable hash order so the selection is a
  // deterministic uniform sample and identical on any engine. The rank
  // filter is the shape Spark's WindowGroupLimit optimization recognizes:
  // each map task pre-limits its partition to the top-N per group BEFORE
  // the shuffle, so at 100 TB the exchange carries ~N rows per
  // (source, input-partition), not the whole corpus.
  def q103(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cap = 40
    val key = conv(substring(md5(concat_ws("|", lit("cap"), $"doc_id")), 1, 14), 16, 10)
      .cast("long")
    Tables.documents(s, d)
      .withColumn("k", key)
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"k", $"doc_id")))
      .filter($"rk" <= cap)
      .select($"source", $"rk", $"doc_id")
      .orderBy($"source", $"rk")
  }
  val q103Sql: String =
    """SELECT source, rk, doc_id FROM (
      |  SELECT source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY k, doc_id) AS rk
      |  FROM (SELECT source, doc_id,
      |          ('0x' || substr(md5('cap|' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS k
      |        FROM documents))
      |WHERE rk <= 40
      |ORDER BY source, rk""".stripMargin

  // --- q104: fixed-size chunking with overlap --------------------------------
  // The RAG / context-window prep step: split each document into
  // 120-char chunks on a 90-char stride (30-char overlap), so every
  // character of the source text lands in at least one chunk and chunk
  // boundaries never cut more than the overlap from any span. The chunk
  // starts are a generator (sequence + explode, 1 row -> N) — Catalyst's
  // Generate node, fully distributed, no shuffle until the per-doc
  // rollup. Output stays bounded by rolling up to one row per document:
  // chunk count, total chunk chars (= len + (n-1)*overlap for full
  // chunks), and the SUM of 56-bit chunk fingerprints — a content hash
  // of every chunk that fits a BIGINT (<=2^56 per chunk, corpus docs are
  // far below 2^7 chunks).
  def q104(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val chunkLen = 120
    val stride = 90
    Tables.documents(s, d)
      .filter(length($"text") > 0)
      .withColumn("i",
        explode(sequence(lit(0),
          floor((length($"text") - 1) / lit(stride)).cast("int"))))
      .withColumn("chunk", $"text".substr($"i" * stride + 1, lit(chunkLen)))
      .withColumn("fp", conv(substring(md5($"chunk"), 1, 14), 16, 10).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(length($"chunk")).as("sum_chunk_chars"),
        sum($"fp").as("fp_sum"))
      .orderBy($"doc_id")
  }
  val q104Sql: String =
    """SELECT doc_id, COUNT(*) AS n_chunks,
      |  CAST(SUM(length(chunk)) AS BIGINT) AS sum_chunk_chars,
      |  CAST(SUM(fp) AS BIGINT) AS fp_sum
      |FROM (
      |  SELECT doc_id, substr(text, i * 90 + 1, 120) AS chunk,
      |    ('0x' || substr(md5(substr(text, i * 90 + 1, 120)), 1, 14))::BIGINT AS fp
      |  FROM (
      |    SELECT doc_id, text,
      |      unnest(range(0, CAST(floor((length(text) - 1) / 90.0) AS INT) + 1)) AS i
      |    FROM documents WHERE length(text) > 0))
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // --- q105: robust outlier detection (median/MAD) ---------------------------
  // Length-outlier filtering the robust way: per source, flag documents
  // whose |n_chars - median| exceeds 3x the median absolute deviation.
  // Median/MAD (not mean/stddev) so a single giant document cannot drag
  // the threshold. Exact interpolated percentile in both engines; n_chars
  // is integral so every median/MAD/deviation lives on the exact 0.5
  // binary grid — no rounding needed anywhere. Two percentile
  // aggregations over (source) — a handful of groups — with the
  // per-source constants broadcast back onto the corpus, so the corpus
  // itself is scanned, never shuffled.
  def q105(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"source", $"doc_id", $"n_chars")
    val med = docs.groupBy($"source")
      .agg(percentile($"n_chars", lit(0.5)).as("med"))
    val dev = docs.join(broadcast(med), Seq("source"))
      .withColumn("adev", abs($"n_chars" - $"med"))
    val mad = dev.groupBy($"source")
      .agg(percentile($"adev", lit(0.5)).as("mad"))
    dev.join(broadcast(mad), Seq("source"))
      .withColumn("is_out", $"adev" > $"mad" * lit(3.0))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"is_out", 1L).otherwise(0L)).as("n_outliers"),
        min(when($"is_out", $"n_chars")).as("min_outlier_chars"),
        max(when($"is_out", $"n_chars")).as("max_outlier_chars"),
        min($"med").as("med_chars"),
        min($"mad").as("mad_chars"))
      .orderBy($"source")
  }
  val q105Sql: String =
    """WITH m AS (
      |  SELECT source, median(n_chars) AS med FROM documents GROUP BY source
      |), d AS (
      |  SELECT doc_id, documents.source, n_chars, med,
      |    abs(n_chars - med) AS adev
      |  FROM documents JOIN m ON documents.source = m.source
      |), md AS (
      |  SELECT source, median(adev) AS mad FROM d GROUP BY source
      |)
      |SELECT d.source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN adev > mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  MIN(CASE WHEN adev > mad * 3.0 THEN n_chars END) AS min_outlier_chars,
      |  MAX(CASE WHEN adev > mad * 3.0 THEN n_chars END) AS max_outlier_chars,
      |  MIN(med) AS med_chars, MIN(mad) AS mad_chars
      |FROM d JOIN md ON d.source = md.source
      |GROUP BY d.source
      |ORDER BY d.source""".stripMargin

  // --- q106: source-vs-corpus distribution divergence (JSD) ------------------
  // The data-mixing diagnostic: Jensen-Shannon divergence between each
  // source's unigram distribution P and the whole-corpus distribution Q.
  // JSD = 0.5*KL(P||M) + 0.5*KL(Q||M), M=(P+Q)/2 — symmetric, bounded by
  // ln 2, and defined even where P has zero mass (the Q-side term alone
  // contributes q*ln2/2 there), so every corpus token participates.
  //
  // Determinism across engines (Q.scala conventions): probabilities and
  // the per-token contribution are IEEE-identical double arithmetic in
  // both engines except ln()'s last ulp, so each token's contribution is
  // snapped to an integer 1e-9 grid BEFORE summation; the sum of longs is
  // exact, and the final jsd is ONE double division of identical integers
  // (never ROUND a quotient off a grid — the q39 tie trap).
  //
  // Scale: everything after the token count is vocab-sized, not
  // corpus-sized (Heaps' law). The (source x vocab) pair table is built
  // by broadcasting the per-source totals (a handful of rows) onto the
  // corpus vocabulary — the corpus itself is touched once, by the token
  // count's single shuffle.
  def q106(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bySrc = Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c_s"))
    val srcTot = bySrc.groupBy($"source").agg(sum($"c_s").as("n_s"))
    val corpus = bySrc.groupBy($"tok").agg(sum($"c_s").as("c_q"))
    val corpusTot = corpus.agg(sum($"c_q").as("n_q"))
    val pairs = corpus
      .crossJoin(broadcast(srcTot))
      .crossJoin(broadcast(corpusTot))
      .join(bySrc, Seq("source", "tok"), "left")
    // p must be COALESCED to 0 before building m: a null c_s would null m
    // and with it the q-side term, silently dropping every token the
    // source lacks from the sum (exactly the terms that contribute q*ln2/2).
    val p = coalesce($"c_s", lit(0L)) * lit(1.0) / $"n_s"
    val q = $"c_q" * lit(1.0) / $"n_q"
    val m = (p + q) / lit(2.0)
    val contrib = lit(0.5) *
      (when($"c_s".isNotNull, p * log(p / m)).otherwise(lit(0.0)) + q * log(q / m))
    pairs
      .withColumn("e9", round(contrib * lit(1e9)).cast("long"))
      .groupBy($"source")
      .agg(min($"n_s").as("n_tokens"),
        count($"c_s").as("n_vocab"),
        sum($"e9").as("jsd_e9"))
      .withColumn("jsd", $"jsd_e9".cast("double") / lit(1e9))
      .select($"source", $"n_tokens", $"n_vocab", $"jsd")
      .orderBy($"source")
  }
  val q106Sql: String =
    """WITH toks AS (
      |  SELECT source,
      |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |  FROM documents
      |), bysrc AS (
      |  SELECT source, tok, COUNT(*) AS c_s FROM toks GROUP BY 1, 2
      |), srctot AS (
      |  SELECT source, CAST(SUM(c_s) AS BIGINT) AS n_s FROM bysrc GROUP BY 1
      |), corpus AS (
      |  SELECT tok, CAST(SUM(c_s) AS BIGINT) AS c_q FROM bysrc GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(c_q) AS BIGINT) AS n_q FROM corpus
      |), contrib AS (
      |  SELECT s.source, s.n_s, b.c_s,
      |    CAST(round(1e9 * 0.5 * (
      |      CASE WHEN b.c_s IS NOT NULL
      |        THEN (b.c_s * 1.0 / s.n_s) *
      |             ln((b.c_s * 1.0 / s.n_s) /
      |                (((b.c_s * 1.0 / s.n_s) + (c.c_q * 1.0 / t.n_q)) / 2.0))
      |        ELSE 0.0 END
      |      + (c.c_q * 1.0 / t.n_q) *
      |        ln((c.c_q * 1.0 / t.n_q) /
      |           (((COALESCE(b.c_s, 0) * 1.0 / s.n_s) + (c.c_q * 1.0 / t.n_q)) / 2.0))
      |    )) AS BIGINT) AS e9
      |  FROM corpus c CROSS JOIN srctot s CROSS JOIN tot t
      |  LEFT JOIN bysrc b ON b.source = s.source AND b.tok = c.tok
      |)
      |SELECT source, MIN(n_s) AS n_tokens,
      |  CAST(COUNT(c_s) AS BIGINT) AS n_vocab,
      |  CAST(SUM(e9) AS BIGINT) * 1.0 / 1e9 AS jsd
      |FROM contrib
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --- q108: incremental dedup of a new batch against the corpus ------------
  // The steady-state dedup shape: a fresh crawl batch arrives and must be
  // deduplicated against the EXISTING corpus, not just within itself.
  // Exact match on the canonical-text fingerprint; the batch-vs-corpus
  // membership test routes through BloomPrune — the corpus side is pruned
  // by a distributed bloom filter built over the (small) batch's
  // fingerprints before the exact semi join, so at 100 TB the join
  // shuffle moves ~fpp of the corpus instead of all of it. Bloom false
  // positives are stripped by the exact join, so the result is provably
  // identical to the plain semi join and stays oracle-checkable.
  def q108(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", $"source", fingerprint($"text").as("fp"))
    val corpus = docs.filter($"doc_id" % 3 =!= 0)
    val batch = docs.filter($"doc_id" % 3 === 0)
    // Corpus fingerprints that also occur in the batch (bloom-pruned,
    // then exact); a batch row whose fp survives is a duplicate.
    val hit = graft.operators.BloomPrune.bloomSemiJoin(
      corpus.select($"fp"), batch.select($"fp"), "fp", expectedItems = 100000L)
    batch
      .join(hit.distinct().withColumn("hit", lit(1)), Seq("fp"), "left")
      .withColumn("is_dup", $"hit".isNotNull)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_batch"),
        sum(when($"is_dup", 1L).otherwise(0L)).as("n_dup"),
        sum(when(!$"is_dup", 1L).otherwise(0L)).as("n_kept"),
        min(when($"is_dup", $"doc_id")).as("min_dup_doc"),
        max(when($"is_dup", $"doc_id")).as("max_dup_doc"))
      .orderBy($"source")
  }
  val q108Sql: String =
    """WITH f AS (
      |  SELECT doc_id, source,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |  FROM documents
      |), corpus AS (
      |  SELECT fp FROM f WHERE doc_id % 3 <> 0
      |), batch AS (
      |  SELECT * FROM f WHERE doc_id % 3 = 0
      |)
      |SELECT source, COUNT(*) AS n_batch,
      |  CAST(SUM(CASE WHEN fp IN (SELECT fp FROM corpus) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  CAST(SUM(CASE WHEN fp IN (SELECT fp FROM corpus) THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
      |  MIN(CASE WHEN fp IN (SELECT fp FROM corpus) THEN doc_id END) AS min_dup_doc,
      |  MAX(CASE WHEN fp IN (SELECT fp FROM corpus) THEN doc_id END) AS max_dup_doc
      |FROM batch
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --- q109: cross-source duplicate overlap matrix ---------------------------
  // The dedup diagnostic that decides source ordering in a curation
  // pipeline: for every source pair, how many distinct canonical-text
  // fingerprints appear in BOTH sources (mirror-site / syndication
  // detection). Distinct (source, fp) first — one shuffle, corpus-sized —
  // then a self-join on fp whose posting lists are bounded by the number
  // of sources (≤5 here), so the pair fan-out is linear in the corpus,
  // never quadratic: the matrix costs the same as the dedup scan itself.
  def q109(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fps = Tables.documents(s, d)
      .select($"source", fingerprint($"text").as("fp"))
      .distinct()
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .groupBy($"src_a", $"src_b")
      .agg(count(lit(1)).as("n_shared_fps"))
      .orderBy($"src_a", $"src_b")
  }
  val q109Sql: String =
    """WITH fps AS (
      |  SELECT DISTINCT source,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |  FROM documents
      |)
      |SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared_fps
      |FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
      |GROUP BY 1, 2
      |ORDER BY src_a, src_b""".stripMargin

  // --- q111: per-document token entropy --------------------------------------
  // Shannon entropy of each document's own token distribution — the
  // repetitiveness signal orthogonal to q36's gram-repeat ratio (a doc
  // cycling 3 tokens has low entropy but may repeat no 5-gram). Shape:
  // explode → (doc, tok) count → windowed doc total → per-token -p·ln(p)
  // snapped to the 1e-9 integer grid (Q.scala ln-ulp convention) →
  // per-doc sum. Two shuffles, but every task's work is linear in its
  // rows. The tempting zero-shuffle alternative (per-row higher-order
  // filter() inside transform()) is O(distinct·tokens) PER DOCUMENT —
  // a 100k-token doc with 20k distinct tokens costs ~2e9 interpreted
  // comparisons in one task, the straggler shape this codebase's own
  // measurements reject (cf. Dedup.simhashPairs' 50x explode win).
  def q111(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wDoc = Window.partitionBy($"doc_id")
    Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
      .withColumn("n", sum($"c").over(wDoc))
      .withColumn("e9", {
        val p = $"c" * lit(1.0) / $"n"
        round(-p * log(p) * lit(1e9)).cast("long")
      })
      .groupBy($"doc_id")
      .agg(max($"n").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        (sum($"e9").cast("double") / lit(1e9)).as("entropy"))
      .orderBy($"doc_id")
  }
  val q111Sql: String =
    """SELECT doc_id, len(t) AS n_tokens, len(u) AS n_distinct,
      |  CAST(list_sum(list_transform(u, x ->
      |    CAST(round(-(len(list_filter(t, y -> y = x)) * 1.0 / len(t)) *
      |               ln(len(list_filter(t, y -> y = x)) * 1.0 / len(t)) * 1e9)
      |         AS BIGINT))) AS BIGINT) * 1.0 / 1e9 AS entropy
      |FROM (SELECT doc_id,
      |        string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t,
      |        list_distinct(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS u
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  // --- q112: per-stratum fraction sampling (deterministic sampleBy) ----------
  // The engine's answer to DataFrameStatFunctions.sampleBy, made
  // deterministic and engine-portable: keep a row iff its 56-bit md5 key
  // falls below floor(fraction·2^56), with the fraction chosen per
  // stratum (src0 keeps 50%, the rest 20%). Pure filter — no shuffle, no
  // state, reproducible on any engine; the aggregate rollup just makes
  // the output compact. The integer thresholds are EXACT literals in both
  // engines, so the kept set is bit-identical (never compare k/2^56
  // against a double fraction — the product rounds).
  def q112(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val keep50 = 36028797018963968L // floor(0.5 * 2^56)
    val keep20 = 14411518807585587L // floor(0.2 * 2^56)
    val key = conv(substring(md5(concat_ws("|", lit("strat"), $"doc_id")), 1, 14), 16, 10)
      .cast("long")
    Tables.documents(s, d)
      .withColumn("k", key)
      .withColumn("kept",
        $"k" < when($"source" === "src0", keep50).otherwise(keep20))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_total"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_sampled"),
        min(when($"kept", $"doc_id")).as("min_sampled_doc"),
        max(when($"kept", $"doc_id")).as("max_sampled_doc"))
      .orderBy($"source")
  }
  val q112Sql: String =
    """SELECT source, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  MIN(CASE WHEN kept THEN doc_id END) AS min_sampled_doc,
      |  MAX(CASE WHEN kept THEN doc_id END) AS max_sampled_doc
      |FROM (
      |  SELECT source, doc_id,
      |    ('0x' || substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
      |      < CASE WHEN source = 'src0' THEN 36028797018963968 ELSE 14411518807585587 END AS kept
      |  FROM documents)
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --- q113: containment join (subsumption dedup) ----------------------------
  // Probe slice (doc_id ≡ 0 mod 5 — the "new batch" shape) checked for
  // ≥80% n-gram containment inside ANY corpus document. See
  // Dedup.containmentJoin for the one-sided lossless prefix filter; the
  // oracle is the brute-force all-pairs restatement with only the
  // lossless |b| ≥ t·|a| prune.
  def q113(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    Dedup.containmentJoin(docs.filter($"doc_id" % 5 === 0), docs,
        "doc_id", "text", n = 3, threshold = 0.8, eagerSkewProbe = true)
      .orderBy($"doc_a", $"doc_b")
  }
  val q113Sql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM (SELECT doc_id,
      |          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |        FROM documents)
      |  WHERE len(t) >= 3
      |), probe AS (
      |  SELECT * FROM sh WHERE doc_id % 5 = 0
      |)
      |SELECT doc_a, doc_b, containment FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.s, b.s)) * 1.0 / len(a.s) AS containment
      |  FROM probe a JOIN sh b ON a.doc_id <> b.doc_id
      |    AND len(b.s) >= 0.8 * len(a.s))
      |WHERE containment >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  // --- q117: corpus length-inequality (Gini) per source ----------------------
  // The balance diagnostic behind "is this source a few mega-documents or
  // many small ones": the Gini coefficient of the document-length
  // distribution, from the Lorenz-curve identity
  //   G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx)
  // with ranks ascending by length. Everything except the final division
  // is exact int64 arithmetic (ties ordered by doc_id — swapping equal x
  // across ranks leaves Σ rank·x unchanged, so the value is
  // tie-independent); the one double division of identical integers is
  // bit-stable on any engine. One shuffle for the per-source rank window,
  // one for the rollup.
  def q117(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")).cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        sum($"rk" * $"n_chars").as("rx"))
      .withColumn("gini",
        (lit(2L) * $"rx" - ($"n_docs" + 1L) * $"total_chars").cast("double") /
          ($"n_docs" * $"total_chars").cast("double"))
      .select($"source", $"n_docs", $"total_chars", $"gini")
      .orderBy($"source")
  }
  val q117Sql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(2 * SUM(rk * n_chars) - (COUNT(*) + 1) * SUM(n_chars) AS DOUBLE)
      |    / CAST(COUNT(*) * SUM(n_chars) AS DOUBLE) AS gini
      |FROM (
      |  SELECT source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk
      |  FROM documents)
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --- q119: Gopher-style repetition rules ------------------------------------
  // The two repetition-filter families from Rae et al. 2021 (Gopher, table
  // A1), token-based: the fraction of 2-gram positions held by the single
  // most frequent 2-gram (threshold 0.20), and the fraction of 5-gram
  // occurrences whose gram repeats within the doc (threshold 0.15).
  //
  // Both gram sizes ride ONE pipeline: each token row emits a (size, gram)
  // pair for n=2 and n=5 from the same lead() window, so the corpus is
  // scanned, tokenized, and window-sorted exactly once, and one
  // (doc,size,gram) count + one conditional per-doc rollup replace two
  // parallel aggregation trees. (The naive two-branch form planned as two
  // full scan->explode->window chains: Catalyst prunes the unused leads per
  // branch, which defeats exchange reuse — sharing must be structural, not
  // optimizer-dependent.) Counts are exact integers and the fractions
  // small-integer ratios — IEEE-exact in both engines. Using only the MAX
  // count (never the argmax gram) keeps the result tie-independent.
  def q119(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tokRows = Tables.documents(s, d).select($"doc_id",
      posexplode(tokens($"text")).as(Seq("pos", "tok")))
    val wOrd = Window.partitionBy($"doc_id").orderBy($"pos")
    // concat_ws SKIPS nulls (a short tail would yield a truncated gram,
    // not null), so gram validity is decided by the furthest lead.
    val grams = tokRows
      .withColumn("t1", lead($"tok", 1).over(wOrd))
      .withColumn("t2", lead($"tok", 2).over(wOrd))
      .withColumn("t3", lead($"tok", 3).over(wOrd))
      .withColumn("t4", lead($"tok", 4).over(wOrd))
      .select($"doc_id", explode(array(
        struct(lit(2).as("n"), when($"t1".isNotNull,
          concat_ws(" ", $"tok", $"t1")).as("g")),
        struct(lit(5).as("n"), when($"t4".isNotNull,
          concat_ws(" ", $"tok", $"t1", $"t2", $"t3", $"t4")).as("g"))))
        .as("gr"))
      .select($"doc_id", $"gr.n".as("n"), $"gr.g".as("g"))
      .filter($"g".isNotNull)
    grams.groupBy($"doc_id", $"n", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(max(when($"n" === 2, $"c")).as("top2_n"),
        sum(when($"n" === 2, $"c")).as("n_2grams"),
        sum(when($"n" === 5, when($"c" >= 2, $"c").otherwise(lit(0L))))
          .as("dup5_n"),
        sum(when($"n" === 5, $"c")).as("n_5grams"))
      // docs too short for any 5-gram would have null dup5_n/n_5grams:
      // keep the two-table form's inner-join semantics and drop them
      // (none exist in the testdata corpus)
      .filter($"n_5grams".isNotNull)
      .select($"doc_id", $"top2_n", $"n_2grams",
        ($"top2_n" / $"n_2grams").as("top2_frac"),
        $"dup5_n", $"n_5grams",
        ($"dup5_n" / $"n_5grams").as("dup5_frac"),
        (($"top2_n" / $"n_2grams") > 0.20 ||
          ($"dup5_n" / $"n_5grams") > 0.15).as("flagged"))
      .orderBy($"doc_id")
  }
  val q119Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |c2 AS (
      |  SELECT doc_id, g, COUNT(*) AS c FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |      i -> t[i] || ' ' || t[i+1])) AS g
      |    FROM toks WHERE len(t) >= 2)
      |  GROUP BY doc_id, g),
      |a2 AS (
      |  SELECT doc_id, MAX(c) AS top2_n, CAST(SUM(c) AS BIGINT) AS n_2grams
      |  FROM c2 GROUP BY doc_id),
      |c5 AS (
      |  SELECT doc_id, g, COUNT(*) AS c FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS g
      |    FROM toks WHERE len(t) >= 5)
      |  GROUP BY doc_id, g),
      |a5 AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup5_n,
      |    CAST(SUM(c) AS BIGINT) AS n_5grams
      |  FROM c5 GROUP BY doc_id)
      |SELECT a2.doc_id, top2_n, n_2grams, top2_n / n_2grams AS top2_frac,
      |  dup5_n, n_5grams, dup5_n / n_5grams AS dup5_frac,
      |  (top2_n / n_2grams > 0.20 OR dup5_n / n_5grams > 0.15) AS flagged
      |FROM a2 JOIN a5 USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // --- q120: BM25 full-text relevance (inverted-index search) -----------------
  // The search primitive a training-data pipeline uses for quality probes
  // and targeted decontamination: Okapi BM25 over the corpus for a fixed
  // conjunctive term set, top-20 by relevance.
  //   score(d) = Σ_t ln((N−df+0.5)/(df+0.5) + 1) · tf·(k1+1) /
  //                 (tf + k1·(1−b + b·dl/avgdl))
  // Constants k1=1.5 and b=0.75 are exact binary fractions, dl/avgdl is
  // computed as dl·N/Σdl from exact integers, so the only cross-engine
  // noise is ln()'s last ulp — each (doc,term) contribution is snapped to
  // the 1e-9 integer grid before the per-doc sum (q106 convention), and
  // the top-20 order is over grid integers with a doc_id tiebreak —
  // fully deterministic.
  //
  // Scale shape: the corpus is exploded once; the tf aggregation only
  // shuffles rows matching the query terms (filter before the groupBy),
  // dl needs one count-shuffle over all tokens, and df/N/Σdl are
  // vocab/doc-sized aggregates broadcast onto the matches. Plan ends in
  // TakeOrderedAndProject — per-partition top-k, no global sort.
  def q120(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val terms = Seq("spark", "join", "window")
    val tokRows = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
    val dl = tokRows.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("tot_dl"))
    val tf = tokRows.filter($"tok".isin(terms: _*))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    val k1 = lit(1.5); val b = lit(0.75)
    val dlRatio = ($"dl" * $"n_docs").cast("double") / $"tot_dl".cast("double")
    val idf = log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1.0)
    val contrib = idf * ($"tf" * (k1 + 1.0)) /
      ($"tf" + k1 * (lit(1.0) - b + b * dlRatio))
    tf.join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("e9", round(contrib * lit(1e9)).cast("long"))
      .groupBy($"doc_id")
      .agg(min($"dl").as("dl"), count(lit(1)).as("n_terms"),
        sum($"e9").as("score_e9"))
      .withColumn("score", $"score_e9".cast("double") / lit(1e9))
      .select($"doc_id", $"dl", $"n_terms", $"score")
      .orderBy($"score".desc, $"doc_id")
      .limit(20)
  }
  val q120Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |  FROM documents),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      |stats AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS tot_dl FROM dl),
      |tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      |  WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2),
      |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id, dl.dl,
      |    CAST(round(
      |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      |        * (tf * (1.5 + 1.0))
      |        / (tf + 1.5 * (1.0 - 0.75 + 0.75 *
      |            (CAST(dl.dl * n_docs AS DOUBLE) / CAST(tot_dl AS DOUBLE))))
      |      * 1e9) AS BIGINT) AS e9
      |  FROM tf JOIN df USING (tok) JOIN dl ON tf.doc_id = dl.doc_id
      |  CROSS JOIN stats)
      |SELECT doc_id, MIN(dl) AS dl, COUNT(*) AS n_terms,
      |  CAST(CAST(SUM(e9) AS BIGINT) AS DOUBLE) / 1e9 AS score
      |FROM scored
      |GROUP BY doc_id
      |ORDER BY score DESC, doc_id
      |LIMIT 20""".stripMargin

  // --- q123: Gopher duplicate-LINE repetition rules ------------------------
  // The line-granularity Gopher family (Rae et al. 2021, table A1) that
  // q119's n-gram rules don't cover: duplicate line fraction (> 0.30) and
  // duplicate line character fraction (> 0.20). The operator
  // (operators.Dedup.duplicateLineStats) is segmentation-generic — real
  // corpora split on '\n'; the testdata corpus is single-line word soup,
  // so "lines" here are disjoint 3-token chunks, which both engines derive
  // identically and which make the duplicate statistics non-degenerate
  // (the small vocabulary collides 3-token chunks within docs). Counts are
  // exact integers; fractions are single int/int divisions — IEEE-exact in
  // both engines (q119 convention).
  def q123(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Chunking via posexplode + lead() window, the q119 shingle idiom,
    // NOT transform(sequence, i -> slice(...)): the higher-order-function
    // form is interpreted (no codegen) and its per-chunk slice copies made
    // it 4x slower than this windowed plan on the same data. Disjoint
    // chunks = keep only every 3rd position with a full tail.
    val wOrd = Window.partitionBy($"doc_id").orderBy($"pos")
    val lineRows = Tables.documents(s, d)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("t1", lead($"tok", 1).over(wOrd))
      .withColumn("t2", lead($"tok", 2).over(wOrd))
      .filter($"pos" % 3 === 0 && $"t2".isNotNull)
      .select($"doc_id", concat_ws(" ", $"tok", $"t1", $"t2").as("line"))
    graft.operators.Dedup.duplicateLineRowStats(lineRows)
      .orderBy($"doc_id")
  }
  val q123Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |lines AS (
      |  SELECT doc_id, unnest(list_transform(range(0, len(t) // 3),
      |    i -> t[i*3+1] || ' ' || t[i*3+2] || ' ' || t[i*3+3])) AS line
      |  FROM toks WHERE len(t) >= 3),
      |c AS (
      |  SELECT doc_id, line, COUNT(*) AS c, len(line) AS chars
      |  FROM lines GROUP BY doc_id, line),
      |a AS (
      |  SELECT doc_id,
      |    CAST(SUM(c) AS BIGINT) AS n_lines,
      |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_lines,
      |    CAST(SUM(c * chars) AS BIGINT) AS n_chars,
      |    CAST(SUM(CASE WHEN c >= 2 THEN c * chars ELSE 0 END) AS BIGINT) AS dup_chars
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id, n_lines, dup_lines, dup_lines / n_lines AS dup_line_frac,
      |  n_chars, dup_chars, dup_chars / n_chars AS dup_char_frac,
      |  (dup_lines / n_lines > 0.30 OR dup_chars / n_chars > 0.20) AS flagged
      |FROM a
      |ORDER BY doc_id""".stripMargin

  // --- q124: C4-style corpus-level boilerplate line removal ----------------
  // The cleaning rule (Raffel et al. 2020 §2.2 / RefinedWeb line-wise
  // filters): any "line" occurring in >= 3 distinct documents is
  // boilerplate and removed from every document; survivors reassemble in
  // original order (operators.Dedup.removeBoilerplateLines). Lines are the
  // q123 3-token chunks (the corpus is single-line; the small vocabulary
  // makes chunk-lines genuinely recur across docs — 292 of 497 surviving
  // sf0.01 docs lose lines, 3 docs disappear entirely). Text equality is
  // exact string agreement, so this also proves cross-engine ordering.
  def q124(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"doc_id").orderBy($"pos")
    val lineRows = Tables.documents(s, d)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("t1", lead($"tok", 1).over(wOrd))
      .withColumn("t2", lead($"tok", 2).over(wOrd))
      .filter($"pos" % 3 === 0 && $"t2".isNotNull)
      .select($"doc_id", $"pos",
        concat_ws(" ", $"tok", $"t1", $"t2").as("line"))
    graft.operators.Dedup.removeBoilerplateLines(lineRows, minDocs = 3)
      .orderBy($"doc_id")
  }
  val q124Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |lines AS (
      |  SELECT doc_id, s.pos AS pos, s.line AS line FROM (
      |    SELECT doc_id, unnest(list_transform(range(0, len(t) // 3),
      |      i -> {'pos': i, 'line': t[i*3+1] || ' ' || t[i*3+2] || ' ' || t[i*3+3]})) AS s
      |    FROM toks WHERE len(t) >= 3)),
      |bp AS (
      |  SELECT line FROM (
      |    SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY 1)
      |  WHERE nd >= 3),
      |per_doc AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY 1),
      |kept AS (SELECT * FROM lines ANTI JOIN bp USING (line))
      |SELECT k.doc_id, string_agg(k.line, chr(10) ORDER BY k.pos) AS text,
      |  COUNT(*) AS n_kept, CAST(MIN(p.n_lines) - COUNT(*) AS BIGINT) AS n_removed
      |FROM kept k JOIN per_doc p ON k.doc_id = p.doc_id
      |GROUP BY k.doc_id
      |ORDER BY k.doc_id""".stripMargin

  // --- q125: DSIR importance resampling (data selection) -------------------
  // operators.Dsir.importanceWeights over the corpus with target domain
  // lang='en': top-50 most target-like documents by hashed unigram+bigram
  // importance weight. Ordering is on the exact integer logw_e9 (1e-9
  // grid), so the top-k cut is engine-independent down to the doc_id
  // tiebreak.
  def q125(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.operators.Dsir.importanceWeights(
        Tables.documents(s, d), isTarget = $"lang" === "en")
      .orderBy($"logw_e9".desc, $"doc_id")
      .limit(50)
  }
  val q125Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, unnest(list_concat(
      |    list_transform(t, x -> 'u|' || x),
      |    list_transform(range(1, len(t)), i -> 'b|' || t[i] || ' ' || t[i+1]))) AS f
      |  FROM toks),
      |dc AS (
      |  SELECT doc_id, ('0x' || substr(md5(f), 1, 14))::BIGINT % 4096 AS b,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM feats GROUP BY 1, 2),
      |flags AS (SELECT doc_id, (lang = 'en') AS tgt FROM documents),
      |bc AS (
      |  SELECT b,
      |    CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS ct,
      |    CAST(SUM(c) AS BIGINT) AS cr
      |  FROM dc JOIN flags USING (doc_id) GROUP BY b),
      |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr FROM bc),
      |ratio AS (
      |  SELECT b, CAST(round(
      |    (ln((ct + 1.0) / (tt + 4096.0)) - ln((cr + 1.0) / (tr + 4096.0))) * 1e9)
      |    AS BIGINT) AS r9
      |  FROM bc CROSS JOIN tot)
      |SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
      |  CAST(SUM(c * r9) AS BIGINT) AS logw_e9,
      |  CAST(CAST(SUM(c * r9) AS BIGINT) AS DOUBLE) / 1e9 AS logw
      |FROM dc JOIN ratio USING (b)
      |GROUP BY dc.doc_id
      |ORDER BY logw_e9 DESC, dc.doc_id
      |LIMIT 50""".stripMargin

  // --- q126: CCNet-style perplexity buckets (head/middle/tail per lang) ----
  // Wenzek et al. 2020 (CCNet): per language, rank documents by LM
  // perplexity and split into head (most fluent) / middle / tail tertiles
  // — the bucketing that decides what gets kept, deprioritized, or
  // dropped. Perplexity proxy = q39's unigram avg-surprisal in its exact
  // integer form (se4 div n_tokens, a 1e-4-grid int), so the ntile order
  // (avg4, doc_id) is engine-independent; ntile(3) is standard SQL in
  // both engines. Bucket labels sort head<middle<tail alphabetically, so
  // the output order needs no extra key.
  def q126(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"doc_id", $"lang", explode(tokens($"text")).as("tok"))
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
    val tot = vocab.agg(sum($"c").as("n_total"))
    val scored = vocab.crossJoin(broadcast(tot))
      .withColumn("surprisal", round(-log($"c" * lit(1.0) / $"n_total"), 4))
      .select($"tok", $"surprisal")
    val perDoc = toks.join(broadcast(scored), "tok")
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(round($"surprisal" * 10000).cast("long")).as("se4"))
      .withColumn("avg4", expr("se4 div n_tokens"))
    val w = Window.partitionBy($"lang").orderBy($"avg4", $"doc_id")
    perDoc.withColumn("t", ntile(3).over(w))
      .withColumn("bucket",
        when($"t" === 1, "head").when($"t" === 2, "middle").otherwise("tail"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        (min($"avg4") / 10000.0).as("min_avg_surprisal"),
        (max($"avg4") / 10000.0).as("max_avg_surprisal"))
      .orderBy($"lang", $"bucket")
  }
  val q126Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |  FROM documents),
      |vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM vocab),
      |scored AS (
      |  SELECT tok, ROUND(-ln(c * 1.0 / n_total), 4) AS surprisal FROM vocab, tot),
      |per_doc AS (
      |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
      |    (CAST(SUM(CAST(ROUND(surprisal * 10000, 0) AS BIGINT)) AS BIGINT)
      |      // COUNT(*)) AS avg4
      |  FROM toks JOIN scored USING (tok)
      |  GROUP BY doc_id, lang),
      |bucketed AS (
      |  SELECT lang, n_tokens, avg4,
      |    CASE ntile(3) OVER (PARTITION BY lang ORDER BY avg4, doc_id)
      |      WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
      |  FROM per_doc)
      |SELECT lang, bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  MIN(avg4) / 10000.0 AS min_avg_surprisal,
      |  MAX(avg4) / 10000.0 AS max_avg_surprisal
      |FROM bucketed
      |GROUP BY lang, bucket
      |ORDER BY lang, bucket""".stripMargin

  // --- q128: DSIR Gumbel-top-k resample (the sampling step) ----------------
  // operators.Dsir.gumbelTopK over the q125 weights: 50 docs drawn without
  // replacement with probability ∝ w(d), via hashed-Gumbel keys on the
  // 1e-9 integer grid — reproducible across engines, no RNG state.
  def q128(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val weights = graft.operators.Dsir.importanceWeights(
      Tables.documents(s, d), isTarget = $"lang" === "en")
    graft.operators.Dsir.gumbelTopK(weights, k = 50)
  }
  val q128Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, unnest(list_concat(
      |    list_transform(t, x -> 'u|' || x),
      |    list_transform(range(1, len(t)), i -> 'b|' || t[i] || ' ' || t[i+1]))) AS f
      |  FROM toks),
      |dc AS (
      |  SELECT doc_id, ('0x' || substr(md5(f), 1, 14))::BIGINT % 4096 AS b,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM feats GROUP BY 1, 2),
      |flags AS (SELECT doc_id, (lang = 'en') AS tgt FROM documents),
      |bc AS (
      |  SELECT b,
      |    CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS ct,
      |    CAST(SUM(c) AS BIGINT) AS cr
      |  FROM dc JOIN flags USING (doc_id) GROUP BY b),
      |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr FROM bc),
      |ratio AS (
      |  SELECT b, CAST(round(
      |    (ln((ct + 1.0) / (tt + 4096.0)) - ln((cr + 1.0) / (tr + 4096.0))) * 1e9)
      |    AS BIGINT) AS r9
      |  FROM bc CROSS JOIN tot),
      |w AS (
      |  SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
      |    CAST(SUM(c * r9) AS BIGINT) AS logw_e9,
      |    CAST(CAST(SUM(c * r9) AS BIGINT) AS DOUBLE) / 1e9 AS logw
      |  FROM dc JOIN ratio USING (b)
      |  GROUP BY dc.doc_id),
      |g AS (
      |  SELECT doc_id, n_feats, logw_e9, logw,
      |    CAST(logw_e9 + CAST(round(-ln(-ln(
      |      ((('0x' || substr(md5('dsir|' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
      |        % 1048576) + 0.5) / 1048576.0)) * 1e9) AS BIGINT) AS BIGINT) AS key_e9
      |  FROM w)
      |SELECT doc_id, n_feats, logw_e9, logw, key_e9
      |FROM g
      |ORDER BY key_e9 DESC, doc_id
      |LIMIT 50""".stripMargin

  // --- q131: BPE pair counting (tokenizer-training core op) ----------------
  // One iteration of byte-pair-encoding training: over the word-frequency
  // table, count adjacent SYMBOL pairs weighted by word frequency — the
  // operation a distributed tokenizer trainer runs once per merge. Words
  // aggregate first (vocab-sized, Heaps' law), so the pair explosion runs
  // over unique words × word length, not corpus tokens. Top-20 pairs by
  // (count desc, pair asc) — exact integers, engine-independent.
  def q131(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
    val wOrd = Window.partitionBy($"w").orderBy($"pos")
    words
      .select($"w", $"wc", posexplode(split($"w", "")).as(Seq("pos", "ch")))
      .withColumn("ch2", lead($"ch", 1).over(wOrd))
      .filter($"ch2".isNotNull)
      .select(concat($"ch", lit(" "), $"ch2").as("pair"), $"wc")
      .groupBy($"pair").agg(sum($"wc").as("n"))
      .orderBy($"n".desc, $"pair")
      .limit(20)
  }
  val q131Sql: String =
    """WITH words AS (
      |  SELECT w, COUNT(*) AS wc FROM (
      |    SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
      |    FROM documents)
      |  GROUP BY w),
      |pairs AS (
      |  SELECT w, wc, s[i] || ' ' || s[i+1] AS pair
      |  FROM (SELECT w, wc, string_split(w, '') AS s FROM words), unnest(range(1, len(s)))  AS t(i))
      |SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
      |FROM pairs
      |GROUP BY pair
      |ORDER BY n DESC, pair
      |LIMIT 20""".stripMargin

  // --- q132: vocabulary coverage curve (tokenizer sizing) ------------------
  // The cumulative fraction of corpus tokens covered by the top-N most
  // frequent words — the curve that sizes a tokenizer's vocabulary.
  // Rank/cumsum over exact integer counts with a word tiebreak; coverage
  // is a single int/int division (IEEE-exact both engines).
  //
  // Scale shape: a running sum at rank r depends only on rows ranked ≤ r,
  // so the curve's top-30 prefix is computed by CUTTING first — a
  // distributed TakeOrderedAndProject over the vocab (per-partition top-30,
  // driver merge of 30-row heads) — and only then windowing over the
  // 30 surviving rows. The global-ordered window never sees more than the
  // display constant, regardless of vocabulary size (TrainingSpec pins
  // this plan: no full-vocab single-partition window).
  def q132(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
    val tot = vocab.agg(sum($"wc").as("n_total"))
    val wRank = Window.orderBy($"wc".desc, $"w")
    vocab.orderBy($"wc".desc, $"w").limit(30)
      .crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(wRank))
      .withColumn("cum", sum($"wc").over(wRank.rowsBetween(Window.unboundedPreceding, 0)))
      .select($"rank", $"w", $"wc", ($"cum" / $"n_total").as("coverage"))
      .orderBy($"rank")
  }
  val q132Sql: String =
    """WITH vocab AS (
      |  SELECT w, COUNT(*) AS wc FROM (
      |    SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
      |    FROM documents)
      |  GROUP BY w),
      |tot AS (SELECT CAST(SUM(wc) AS BIGINT) AS n_total FROM vocab),
      |ranked AS (
      |  SELECT w, wc,
      |    ROW_NUMBER() OVER (ORDER BY wc DESC, w) AS rank,
      |    SUM(wc) OVER (ORDER BY wc DESC, w ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM vocab)
      |SELECT rank, w, CAST(wc AS BIGINT) AS wc,
      |  CAST(cum AS BIGINT) / CAST(n_total AS BIGINT) AS coverage
      |FROM ranked CROSS JOIN tot
      |WHERE rank <= 30
      |ORDER BY rank""".stripMargin

  // --- q133: exact substring dedup with span REMOVAL -----------------------
  // Completes the Lee et al. 2022 pipeline q48 only detects: duplicated
  // 5-token spans keep their canonical (min doc_id) occurrence and are cut
  // from every other document, with surviving tokens reassembled in order.
  // The oracle rebuilds the exact post-removal text per doc, so the hash
  // check proves cut placement, overlap merging, and reassembly order —
  // not just counts — agree across engines (the q124 convention).
  def q133(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.removeDuplicateSpans(Tables.documents(s, d), "doc_id", "text", k = 5)
      .orderBy($"doc_id")
  }
  val q133Sql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS s
      |  FROM documents
      |), toks AS (
      |  SELECT doc_id, i AS tp, s[i] AS tok
      |  FROM (SELECT doc_id, s, unnest(range(1, len(s) + 1)) AS i FROM base)
      |), grams AS (
      |  SELECT doc_id, i AS pos,
      |    substr(md5(s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4]),
      |           1, 16) AS fp
      |  FROM (SELECT doc_id, s, unnest(range(1, len(s) - 3)) AS i
      |        FROM base WHERE len(s) >= 5)
      |), dup AS (
      |  SELECT fp, MIN(doc_id) AS canon FROM grams
      |  GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
      |), covered AS (
      |  SELECT DISTINCT g.doc_id, g.pos + o AS tp
      |  FROM grams g JOIN dup d ON g.fp = d.fp AND g.doc_id <> d.canon,
      |       unnest(range(0, 5)) AS t(o)
      |), tot AS (
      |  SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id
      |), kept AS (
      |  SELECT t.doc_id, t.tp, t.tok
      |  FROM toks t ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.tp = c.tp
      |)
      |SELECT k.doc_id,
      |  string_agg(k.tok, ' ' ORDER BY k.tp) AS text,
      |  CAST(COUNT(*) AS BIGINT) AS n_kept,
      |  CAST(ANY_VALUE(tot.n_toks) - COUNT(*) AS BIGINT) AS n_removed
      |FROM kept k JOIN tot ON k.doc_id = tot.doc_id
      |GROUP BY k.doc_id
      |ORDER BY k.doc_id""".stripMargin

  // --- q134: streaming incremental near-dup --------------------------------
  // The q45 pair set produced INCREMENTALLY: documents stream through a
  // per-row MinHash projection into band buckets whose RocksDB ListState
  // emits candidate pairs on collision (Streams.streamingNearDupCandidates),
  // then the shared exact-Jaccard rerank verifies survivors. Because the
  // streaming signatures reproduce the batch banding bit-for-bit, the
  // result hash-equals q45's brute-force all-pairs oracle — the check that
  // the incremental path loses nothing relative to the batch operator.
  def q134(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cand = graft.streaming.Streams.streamingNearDupCandidates(s, d)
    val sh = Dedup.shingleHashRows(Tables.documents(s, d), "doc_id", "text", 3)
    Dedup.exactJaccardRerank(sh, cand, 0.6)
      .orderBy($"doc_a", $"doc_b")
  }

  // --- q139: Naive-Bayes quality classifier (model-based filtering) --------
  // The model-based quality-filter step (GPT-3/CCNet style: a cheap linear
  // classifier scores every document against a target distribution;
  // Brown et al. 2020 §A, Wenzek et al. 2020 §4.4) with the target class
  // re-expressed on the testdata as lang='en'. Train on the even-doc_id
  // half: per-token add-one-smoothed log-likelihood ratios
  //   llr(t) = ln((cA(t)+1)/(NA+V)) − ln((cB(t)+1)/(NB+V))
  // from EXACT integer counts; each llr and the class prior snap to the
  // 1e-9 integer grid (the q120/q106 ln-ulp convention), so per-doc scores
  // are integer sums — order-independent and engine-exact. Score ALL docs:
  // one token explode, an inner join against the BROADCAST llr table
  // (vocab-bounded — Heaps' law, the q126 convention), one doc-keyed agg.
  // Unseen tokens contribute zero (they cancel in a shared-vocab LLR up to
  // the smoothing mass — the standard deployment shortcut).
  def q139(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val toks = docs.select($"doc_id", explode(tokens($"text")).as("tok"))
    val cls = docs.select($"doc_id", ($"lang" === "en").as("is_en"))
    val train = toks.filter($"doc_id" % 2 === 0).join(cls, "doc_id")
    val cnt = train.groupBy($"tok").agg(
      sum(when($"is_en", 1L).otherwise(0L)).as("ca"),
      sum(when(!$"is_en", 1L).otherwise(0L)).as("cb"))
    val tot = cnt.agg(sum($"ca").as("na"), sum($"cb").as("nb"),
      count(lit(1)).as("v"))
    val llr = cnt.crossJoin(broadcast(tot))
      .withColumn("e9", round((log(($"ca" + 1.0) / ($"na" + $"v"))
        - log(($"cb" + 1.0) / ($"nb" + $"v"))) * lit(1e9)).cast("long"))
      .select($"tok", $"e9")
    val prior = cls.filter($"doc_id" % 2 === 0).agg(
      round(log(sum(when($"is_en", 1L).otherwise(0L)).cast("double")
        / sum(when(!$"is_en", 1L).otherwise(0L))) * lit(1e9)).cast("long")
        .as("prior_e9"))
    val scored = toks.join(broadcast(llr), "tok")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hits"), sum($"e9").as("s9"))
    docs.select($"doc_id").join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .withColumn("t9", $"prior_e9" + coalesce($"s9", lit(0L)))
      .select($"doc_id", coalesce($"n_hits", lit(0L)).as("n_hits"),
        ($"t9".cast("double") / 1e9).as("score"), ($"t9" > 0).as("pred_en"))
      .orderBy($"doc_id")
  }
  val q139Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |  FROM documents),
      |cls AS (SELECT doc_id, (lang = 'en') AS is_en FROM documents),
      |train AS (
      |  SELECT t.tok, c.is_en FROM toks t JOIN cls c USING (doc_id)
      |  WHERE t.doc_id % 2 = 0),
      |cnt AS (
      |  SELECT tok,
      |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN NOT is_en THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM train GROUP BY tok),
      |tot AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
      |    COUNT(*) AS v
      |  FROM cnt),
      |llr AS (
      |  SELECT tok,
      |    CAST(round((ln((ca + 1.0) / (na + v)) - ln((cb + 1.0) / (nb + v))) * 1e9)
      |      AS BIGINT) AS e9
      |  FROM cnt CROSS JOIN tot),
      |prior AS (
      |  SELECT CAST(round(ln(
      |      CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
      |      / SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)) * 1e9) AS BIGINT)
      |    AS prior_e9
      |  FROM documents WHERE doc_id % 2 = 0),
      |scored AS (
      |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
      |    CAST(SUM(e9) AS BIGINT) AS s9
      |  FROM toks t JOIN llr USING (tok) GROUP BY t.doc_id)
      |SELECT d.doc_id, COALESCE(n_hits, 0) AS n_hits,
      |  CAST(prior_e9 + COALESCE(s9, 0) AS DOUBLE) / 1e9 AS score,
      |  (prior_e9 + COALESCE(s9, 0)) > 0 AS pred_en
      |FROM documents d LEFT JOIN scored USING (doc_id) CROSS JOIN prior
      |ORDER BY d.doc_id""".stripMargin

  // --- q140: temperature-based source mixing (multilingual alpha-sampling) -
  // The mixture-reweighting step every multilingual/multi-source training
  // run applies (Conneau & Lample 2019 §3.1; Raffel 2020 §3.4.3):
  // p_i ∝ n_i^α with α=0.3 flattens the source distribution so
  // low-resource slices are upsampled. n_i^0.3 snaps to the 1e-6 grid
  // (pow's cross-engine noise is ~1 ulp — q51's round(6) margin), the
  // normalizer sums exactly in decimal(18,6), and the weight and per-doc
  // sampling rate snap once to the 1e-9 integer grid (the q135
  // margin convention). rate > 1 means upsampling (repeat factor).
  def q140(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.documents(s, d).groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"))
    val p = c.withColumn("pa", round(pow($"n_docs".cast("double"), lit(0.3)), 6))
    val t = p.agg(sum($"pa".cast("decimal(18,6)")).as("tot_pa"),
      sum($"n_docs").as("tot_docs"))
    p.crossJoin(broadcast(t))
      .withColumn("w9", round($"pa" / $"tot_pa".cast("double") * lit(1e9)).cast("long"))
      .withColumn("rate9",
        round($"w9".cast("double") * $"tot_docs" / $"n_docs").cast("long"))
      .select($"lang", $"n_docs", $"pa",
        ($"w9".cast("double") / 1e9).as("weight"),
        ($"rate9".cast("double") / 1e9).as("sample_rate"))
      .orderBy($"lang")
  }
  val q140Sql: String =
    """WITH c AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
      |p AS (
      |  SELECT lang, n_docs, ROUND(pow(CAST(n_docs AS DOUBLE), 0.3), 6) AS pa FROM c),
      |t AS (
      |  SELECT SUM(CAST(pa AS DECIMAL(18,6))) AS tot_pa,
      |    CAST(SUM(n_docs) AS BIGINT) AS tot_docs
      |  FROM p),
      |w AS (
      |  SELECT lang, n_docs, pa,
      |    CAST(round(pa / CAST(tot_pa AS DOUBLE) * 1e9) AS BIGINT) AS w9,
      |    tot_docs
      |  FROM p CROSS JOIN t)
      |SELECT lang, n_docs, pa,
      |  CAST(w9 AS DOUBLE) / 1e9 AS weight,
      |  CAST(CAST(round(CAST(w9 AS DOUBLE) * tot_docs / n_docs) AS BIGINT) AS DOUBLE)
      |    / 1e9 AS sample_rate
      |FROM w
      |ORDER BY lang""".stripMargin

  // --- q151: edit-distance similarity join (typo/variant mining) ----------
  // The string-similarity join family's third member after Jaccard (q83)
  // and containment (q113): token pairs within Levenshtein distance 2 over
  // the corpus VOCABULARY — the spelling-variant / OCR-noise miner that
  // feeds tokenizer normalization. All-pairs levenshtein is O(V²·L²);
  // the FastSS deletion-neighborhood filter is lossless for distance k:
  // if ed(a,b) ≤ k, an optimal alignment has ≤ k non-match columns —
  // deleting a's chars in sub/del columns (≤ k) and b's in sub/ins
  // columns (≤ k) leaves the SAME string, so a and b share a key in
  // their ≤k-deletion neighborhoods. For k=2 that is 1 + L + L(L−1)/2
  // keys per token — a key-bucketed self-join linear in the vocabulary,
  // then the exact levenshtein ≤ 2 rerank runs only on survivors.
  // Vocab-sized input (Heaps' law), not corpus-sized: the explode and
  // join never see raw documents.
  def q151(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("tok"))
      .filter(length($"tok") >= 4)
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
    // keys = {tok} ∪ del1(tok) ∪ del2(tok); sequence() bounds are always
    // ascending (L ≥ 4), so no reversed-sequence surprises
    val keyed = vocab.withColumn("key", explode(expr(
      """array_distinct(concat(
        |  array(tok),
        |  transform(sequence(1, length(tok)),
        |    i -> concat(substr(tok, 1, i - 1),
        |                substr(tok, i + 1, length(tok) - i))),
        |  flatten(transform(sequence(1, length(tok) - 1),
        |    i -> transform(sequence(i + 1, length(tok)),
        |      j -> concat(substr(tok, 1, i - 1),
        |                  substr(tok, i + 1, j - i - 1),
        |                  substr(tok, j + 1, length(tok) - j)))))))""".stripMargin)))
    val a = keyed.select($"key", $"tok".as("t1"), $"cnt".as("cnt1"))
    val b = keyed.select($"key", $"tok".as("t2"), $"cnt".as("cnt2"))
    a.join(b, "key")
      .filter($"t1" < $"t2")
      .select($"t1", $"t2", $"cnt1", $"cnt2").distinct()
      .filter(levenshtein($"t1", $"t2") <= 2)
      .orderBy($"t1", $"t2")
  }
  val q151Sql: String =
    """WITH v AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM (
      |    SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |    FROM documents)
      |  WHERE length(tok) >= 4
      |  GROUP BY tok)
      |SELECT a.tok AS t1, b.tok AS t2, a.cnt AS cnt1, b.cnt AS cnt2
      |FROM v a JOIN v b
      |  ON a.tok < b.tok
      | AND abs(length(a.tok) - length(b.tok)) <= 2
      | AND levenshtein(a.tok, b.tok) <= 2
      |ORDER BY t1, t2""".stripMargin

  // --- q152: positional phrase search (inverted-index adjacency) ----------
  // Exact multi-token phrase matching — the IR primitive BM25 (q120) can't
  // express: "slow hash batch" must occur as CONSECUTIVE tokens. Instead
  // of an n-way postings self-join, each occurrence of phrase term i at
  // position p votes for anchor p−i; an anchor where all n distinct
  // offsets voted is a match (terms are distinct here, so a token matches
  // exactly one offset). One posexplode + one (doc, anchor)-keyed count
  // + one doc rollup — a single corpus-sized shuffle on (doc, anchor),
  // exactly the shape of a distributed inverted-index phrase probe; the
  // non-phrase tokens are filtered before the shuffle, so the exchange
  // carries only phrase-term postings.
  def q152(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val terms = Seq("slow", "hash", "batch")
    val off = terms.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (t, i)) =>
        when($"tok" === t, lit(i)).otherwise(acc) }
    Tables.documents(s, d)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .filter($"tok".isin(terms: _*))
      .select($"doc_id", ($"pos" - off).as("anchor"), off.as("i"))
      .groupBy($"doc_id", $"anchor")
      .agg(countDistinct($"i").as("hits"))
      .filter($"hits" === terms.size)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_matches"),
        (min($"anchor") + 1).cast("long").as("first_pos"))
      .orderBy($"n_matches".desc, $"doc_id")
      .limit(20)
  }
  val q152Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos
      |  FROM d),
      |m AS (
      |  SELECT doc_id,
      |    pos - CASE tok WHEN 'slow' THEN 0 WHEN 'hash' THEN 1 ELSE 2 END AS anchor,
      |    CASE tok WHEN 'slow' THEN 0 WHEN 'hash' THEN 1 ELSE 2 END AS i
      |  FROM p WHERE tok IN ('slow', 'hash', 'batch')),
      |hits AS (
      |  SELECT doc_id, anchor FROM m GROUP BY 1, 2 HAVING COUNT(DISTINCT i) = 3)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
      |  CAST(MIN(anchor) AS BIGINT) AS first_pos
      |FROM hits GROUP BY doc_id
      |ORDER BY n_matches DESC, doc_id
      |LIMIT 20""".stripMargin

  // --- q161: phrase search through the materialized inverted index --------
  // Same answer as q152 (the oracle IS q152Sql), different physical path:
  // the corpus is exploded ONCE into a term_bucket-partitioned positional
  // index (sources/InvertedIndex — the ZOrder-of-text layout), and the
  // probe reads only the phrase terms' partitions. The oracle equality
  // proves the index path answer-identical to the scan path; SourcesSpec
  // proves the partition pruning live. The index is staged ONCE per
  // dataset CONTENT (Stage.derived: persistent across sessions,
  // fingerprint-keyed so a refreshed corpus rebuilds), so repeated
  // invocations — and every later JVM — pay the probe only, matching
  // production where the build is an ingest-time step and the probe is
  // the steady state.
  /** The dataset's staged positional inverted index (Stage.derived:
    * built once per source content; shared by q161's probe and q214's
    * health report — one serving artifact, two access paths). */
  private def textIdx(s: SparkSession, d: String): java.nio.file.Path =
    graft.Stage.derived("invidx_b64", d) { p =>
      graft.sources.InvertedIndex.build(Tables.documents(s, d), p.toString)
    }

  def q161(s: SparkSession, d: String): DataFrame = {
    val base = textIdx(s, d)
    graft.sources.InvertedIndex.phraseProbe(s, base.toString,
      Seq("slow", "hash", "batch")).limit(20)
  }


  // --- q214: inverted-index health report (global content audit) -----------
  // Index observability: document frequency and posting counts for the
  // heaviest terms, read FROM THE STAGED INDEX itself — while the oracle
  // recomputes them from the raw corpus. q161 proves probe answers
  // match; this proves the index's GLOBAL content (every posting, every
  // term) reconciles with the corpus — the audit a search deployment
  // runs after each ingest cycle, and exactly the stats a BM25/phrase
  // planner needs (df for idf, posting sizes for cost estimates). Work
  // is index-scan + one term-keyed aggregation; top-20 by
  // (df desc, postings desc, term) ends in TakeOrderedAndProject.
  def q214(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.read.parquet(textIdx(s, d).toString)
      .groupBy($"term")
      .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("n_postings"))
      .orderBy($"df".desc, $"n_postings".desc, $"term")
      .limit(20)
  }
  val q214Sql: String =
    """SELECT tok AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
      |  CAST(COUNT(*) AS BIGINT) AS n_postings
      |FROM (
      |  SELECT doc_id,
      |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |  FROM documents)
      |WHERE len(tok) > 0
      |GROUP BY tok
      |ORDER BY df DESC, n_postings DESC, term
      |LIMIT 20""".stripMargin

  // --- q189: incremental inverted-index maintenance -------------------------
  // The index-maintenance contract q161's build-once layout implies: the
  // corpus arrives as TWO batches (doc_id parity split), the first builds
  // the index, the second APPENDS its postings (new files under only the
  // touched term buckets — no rewrite of existing postings), and the
  // probe over the maintained index must equal the single-scan answer —
  // the oracle IS q152Sql, exactly like q161, so a lost or duplicated
  // posting in the append path hash-misses. Staged once per dataset
  // CONTENT (Stage.derived); at 100 TB this is how a search index
  // absorbs daily document batches.
  def q189(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = graft.Stage.derived("invidx_incr_b64", d) { p =>
      val docs = Tables.documents(s, d)
      graft.sources.InvertedIndex.build(
        docs.filter($"doc_id" % 2 === 0), p.toString)
      graft.sources.InvertedIndex.append(
        docs.filter($"doc_id" % 2 === 1), p.toString)
    }
    graft.sources.InvertedIndex.phraseProbe(s, base.toString,
      Seq("slow", "hash", "batch")).limit(20)
  }
  val q189Sql: String = q152Sql

  // --- q297: inverted-index tombstone DELETE --------------------------------
  // Completes the index lifecycle q161 (build) and q189 (append) left
  // open: LOGICAL deletion. Removing documents must not rewrite posting
  // files (a doc's terms hash across arbitrary buckets — the rewrite is
  // unbounded at 100 TB); InvertedIndex.delete appends doc_ids to an
  // underscore-hidden `_tombstones` side table and every probe
  // anti-joins it — the log-structured/lakehouse delete. Build on the
  // full corpus (own stage — the shared q161 index must stay undeleted),
  // tombstone doc_id % 7 == 2, probe: the answer must equal computing
  // the phrase search over only the surviving documents from scratch —
  // a posting that outlives its tombstone, or a tombstone that bleeds
  // onto a live doc, hash-misses.
  def q297(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = graft.Stage.derived("invidx_tombstone_b64", d) { p =>
      val docs = Tables.documents(s, d)
      graft.sources.InvertedIndex.build(docs, p.toString)
      graft.sources.InvertedIndex.delete(
        docs.filter($"doc_id" % 7 === 2).select($"doc_id"), p.toString)
    }
    graft.sources.InvertedIndex.phraseProbe(s, base.toString,
      Seq("slow", "hash", "batch")).limit(20)
  }
  val q297Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents WHERE doc_id % 7 <> 2),
      |p AS (
      |  SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos
      |  FROM d),
      |m AS (
      |  SELECT doc_id,
      |    pos - CASE tok WHEN 'slow' THEN 0 WHEN 'hash' THEN 1 ELSE 2 END AS anchor,
      |    CASE tok WHEN 'slow' THEN 0 WHEN 'hash' THEN 1 ELSE 2 END AS i
      |  FROM p WHERE tok IN ('slow', 'hash', 'batch')),
      |hits AS (
      |  SELECT doc_id, anchor FROM m GROUP BY 1, 2 HAVING COUNT(DISTINCT i) = 3)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
      |  CAST(MIN(anchor) AS BIGINT) AS first_pos
      |FROM hits GROUP BY doc_id
      |ORDER BY n_matches DESC, doc_id
      |LIMIT 20""".stripMargin

  // --- q296: RAG chunking with overlap (window 64, stride 48) ----------------
  // The retrieval-prep chunker: token windows of 64 with 16-token overlap
  // (stride 48), the shape every RAG ingest pipeline runs between
  // documents and embeddings. Reported per source: chunk count, chunked
  // token volume (Σ min(64, tk − i·48) over chunk starts i·48 < tk), and
  // the duplication overhead ppm the overlap costs — the number that
  // prices an overlap policy against embedding spend at 100 TB. Chunk
  // starts come from one sequence() explode (linear in chunks); integral
  // ppm end-to-end.
  def q296(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lens = Tables.documents(s, d)
      .select($"source", size(tokens($"text")).cast("long").as("tk"))
    lens
      .select($"source", $"tk",
        explode(expr("sequence(0L, (tk - 1) div 48)")).as("i"))
      .select($"source", $"tk",
        least(lit(64L), $"tk" - $"i" * 48).as("chunk_tokens"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_chunks"),
        sum($"chunk_tokens").as("chunk_token_vol"))
      .join(lens.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"tk").as("n_tokens")), "source")
      .select($"source", $"n_docs", $"n_chunks", $"n_tokens", $"chunk_token_vol",
        // ppm numerator through decimal(38,0)/HUGEINT (the q290 route):
        // token volumes at 100 TB put the raw long product past 2^63
        expr("cast(chunk_token_vol - n_tokens as decimal(38,0)) * 1000000" +
            " div n_tokens")
          .cast("long").as("overhead_ppm"))
      .orderBy($"source")
  }
  val q296Sql: String =
    """WITH lens AS (
      |  SELECT source,
      |    CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS BIGINT) AS tk
      |  FROM documents),
      |chunks AS (
      |  SELECT source, LEAST(64, tk - i * 48) AS chunk_tokens
      |  FROM lens, unnest(range(0, (tk - 1) // 48 + 1)) AS u(i)),
      |cagg AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |    CAST(SUM(chunk_tokens) AS BIGINT) AS chunk_token_vol
      |  FROM chunks GROUP BY source),
      |dagg AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(tk) AS BIGINT) AS n_tokens
      |  FROM lens GROUP BY source)
      |SELECT source, n_docs, n_chunks, n_tokens, chunk_token_vol,
      |  CAST(CAST(chunk_token_vol - n_tokens AS HUGEINT) * 1000000
      |    // n_tokens AS BIGINT) AS overhead_ppm
      |FROM cagg JOIN dagg USING (source)
      |ORDER BY source""".stripMargin

  // --- q162: BPE merge application (tokenizer encode step) ----------------
  // Closes the tokenizer loop q131 (pair counting) and q132 (vocab sizing)
  // opened: APPLY a merge table to the vocabulary. Merges = the top-5
  // initial character pairs by q131's exact ranking (count desc, pair
  // asc) — a one-shot static merge TABLE (true iterative BPE training
  // recounts between merges; the apply step demonstrated here is
  // identical either way). Each word becomes a space-joined symbol
  // sequence; merge k rewrites " a b " → " ab ", repeated to fixpoint
  // (each scan halves remaining occurrences — 6 passes cover words to
  // 128 chars). NOTE: the semantics are a non-overlapping-scan fixpoint,
  // not leftmost-first BPE — replace() consumes the shared space between
  // adjacent matches, so an odd run "aaaaa" converges to "aa a aa" where
  // leftmost-first BPE gives "aa aa a". Both engines use identical
  // non-overlapping replace semantics, so the cross-engine result is
  // still exact; the divergence is only from the classical algorithm. The
  // merge table is driver-collected (≤5 rows, vocab-bounded — the Upsert
  // convention); the oracle re-derives the same table and applies it via
  // scalar subqueries, so both engines select and apply identical merges.
  // Vocab-sized work end to end: the only corpus-sized stage is the word
  // count.
  def q162(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
    val wOrd = Window.partitionBy($"w").orderBy($"pos")
    val merges = words
      .select($"w", $"wc", posexplode(split($"w", "")).as(Seq("pos", "ch")))
      .withColumn("ch2", lead($"ch", 1).over(wOrd))
      .filter($"ch2".isNotNull)
      .select(concat($"ch", lit(" "), $"ch2").as("pair"), $"wc")
      .groupBy($"pair").agg(sum($"wc").as("n"))
      .orderBy($"n".desc, $"pair")
      .limit(5)
      .collect().map(_.getString(0)).toSeq // bounded: 5 vocab-level rows
    val spaced = concat(lit(" "), concat_ws(" ", split($"w", "")), lit(" "))
    val encoded = merges.foldLeft(spaced) { (c, pair) =>
      val rep = " " + pair.replace(" ", "") + " "
      (1 to 6).foldLeft(c)((cc, _) =>
        org.apache.spark.sql.functions.replace(cc, lit(s" $pair "), lit(rep)))
    }
    words.select($"w", $"wc",
        trim(encoded).as("encoded"),
        length($"w").as("n_chars"),
        size(split(trim(encoded), " ")).as("n_symbols"))
      .orderBy($"w")
  }
  val q162Sql: String = {
    def applyMerge(inner: String, rk: Int): String =
      (1 to 6).foldLeft(inner)((c, _) =>
        s"""replace($c,
           |  COALESCE((SELECT ' ' || pair || ' ' FROM m WHERE rk = $rk), chr(1)),
           |  COALESCE((SELECT ' ' || replace(pair, ' ', '') || ' ' FROM m WHERE rk = $rk), ''))""".stripMargin)
    val chain = (1 to 5).foldLeft("sp")((c, rk) => applyMerge(c, rk))
    s"""WITH words AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wc FROM (
       |    SELECT unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
       |    FROM documents)
       |  GROUP BY w),
       |pairs AS (
       |  SELECT s[i] || ' ' || s[i+1] AS pair, wc
       |  FROM (SELECT w, wc, string_split(w, '') AS s FROM words),
       |       unnest(range(1, len(s))) AS t(i)),
       |ranked AS (
       |  SELECT pair, SUM(wc) AS n FROM pairs GROUP BY pair),
       |m AS (
       |  SELECT pair, ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rk
       |  FROM ranked QUALIFY rk <= 5),
       |enc AS (
       |  SELECT w, wc,
       |    ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS sp
       |  FROM words)
       |SELECT w, wc,
       |  trim($chain) AS encoded,
       |  CAST(length(w) AS BIGINT) AS n_chars,
       |  CAST(len(string_split(trim($chain), ' ')) AS BIGINT) AS n_symbols
       |FROM enc
       |ORDER BY w""".stripMargin
  }

  // --- q275: iterative BPE merge induction (tokenizer TRAINING loop) -------
  // The step q162 explicitly deferred: LEARN the merge table instead of
  // applying a static one (Sennrich et al. 2016 — count adjacent symbol
  // pairs, merge the most frequent, RECOUNT, repeat). Ten rounds of the
  // q143/q271 fixpoint discipline: each round counts pairs over the
  // current encoding (vocab-sized — Heaps' law), picks the winner by the
  // q131 exact ranking (count desc, pair asc), collects that ONE row
  // (driver-bounded by construction — the merge table IS ≤10 rows), and
  // rewrites via q162's non-overlapping replace fixpoint. Encodings are
  // eagerly localCheckpoint'ed per round (vocab-sized rows; kills the
  // 6k-nested-replace plan growth — the q271 argument). Stops early when
  // no multi-symbol word remains. The only corpus-sized stage is the
  // word count; every round after it is vocab-sized. The oracle unrolls
  // the identical ten rounds as chained CTEs (pairs_k → top-1 m_k →
  // enc_k), so both engines select and apply identical merges; q162's
  // COALESCE(chr(1)) guard makes an exhausted round a no-op there too.
  def q275(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
    var enc = words.select($"wc",
        concat(lit(" "), concat_ws(" ", split($"w", "")), lit(" ")).as("enc"))
      .localCheckpoint(true)
    val picked = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var k = 1
    var exhausted = false
    while (k <= 10 && !exhausted) {
      val top = enc
        .select($"wc", split(trim($"enc"), " ").as("syms"))
        .filter(size($"syms") >= 2) // sequence(1,0) would DESCEND in Spark
        .select($"wc", explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> concat(syms[i-1], ' ', syms[i]))")).as("pair"))
        .groupBy($"pair").agg(sum($"wc").as("n"))
        .orderBy($"n".desc, $"pair").limit(1)
        .collect() // bounded: exactly one winner row per round
      if (top.isEmpty) exhausted = true
      else {
        val pair = top.head.getString(0)
        val merged = pair.replace(" ", "")
        picked += ((k, pair, merged, top.head.getLong(1)))
        enc = enc.withColumn("enc",
            (1 to 6).foldLeft($"enc": org.apache.spark.sql.Column)((c, _) =>
              org.apache.spark.sql.functions
                .replace(c, lit(s" $pair "), lit(s" $merged "))))
          .localCheckpoint(true)
        k += 1
      }
    }
    picked.toSeq.toDF("rk", "pair", "merged", "n").orderBy($"rk")
  }
  val q275Sql: String = {
    def applyMerge(inner: String, k: Int): String =
      (1 to 6).foldLeft(inner)((c, _) =>
        s"""replace($c,
           |  COALESCE((SELECT ' ' || pair || ' ' FROM m$k), chr(1)),
           |  COALESCE((SELECT ' ' || replace(pair, ' ', '') || ' ' FROM m$k), ''))""".stripMargin)
    val rounds = (1 to 10).map { k =>
      val prev = s"e${k - 1}"
      s"""p$k AS MATERIALIZED (
         |  SELECT s[i] || ' ' || s[i+1] AS pair, wc
         |  FROM (SELECT wc, string_split(trim(enc), ' ') AS s FROM $prev),
         |       unnest(range(1, len(s))) AS t(i)),
         |m$k AS MATERIALIZED (
         |  SELECT pair, CAST(SUM(wc) AS BIGINT) AS n FROM p$k GROUP BY pair
         |  ORDER BY n DESC, pair LIMIT 1),
         |e$k AS MATERIALIZED (SELECT wc, ${applyMerge("enc", k)} AS enc FROM $prev)"""
        .stripMargin
    }.mkString(",\n")
    val unions = (1 to 10).map(k =>
      s"SELECT $k AS rk, pair, replace(pair, ' ', '') AS merged, n FROM m$k")
      .mkString("\nUNION ALL ")
    s"""WITH words AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wc FROM (
       |    SELECT unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
       |    FROM documents)
       |  GROUP BY w),
       |e0 AS MATERIALIZED (
       |  SELECT wc,
       |    ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS enc
       |  FROM words),
       |$rounds
       |SELECT rk, pair, merged, n FROM (
       |$unions)
       |ORDER BY rk""".stripMargin
  }

  // --- q278: Kneser-Ney smoothed bigram model (interpolated, D=0.75) -------
  // The standard n-gram LM estimator (Kneser & Ney 1995; Chen & Goodman
  // 1999's interpolated form): P(w2|w1) = max(c12−D,0)/c1 +
  // (D·N1+(w1,·)/c1) · N1+(·,w2)/N1+(·,·) — absolute discounting with
  // the CONTINUATION-count backoff that makes KN the default for
  // count-based LMs ("how many contexts does w2 follow" rather than
  // "how often does w2 occur"). All five inputs are exact integers
  // (bigram count, left-context total, distinct-successor and
  // distinct-predecessor type counts, total bigram types); the estimate
  // is ONE double chain written in identical operator order in both
  // engines and snapped to the 1e-9 grid (p ≤ 1 ⇒ p·1e9 < 2^53). Shape:
  // one corpus-sized bigram aggregation (map-side combine), then
  // everything joins at vocab scale. Output restricted to bigrams seen
  // ≥5 times — the model rows a serving cache would pin.
  def q278(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.CacheLifecycle.TrackedPersistOps
    val bi = Tables.documents(s, d)
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> struct(toks[i-1] as w1, toks[i] as w2))")).as("b"))
      .select($"b.w1", $"b.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      .persistTracked() // vocab²-bounded; four consumers below
    val left = bi.groupBy($"w1")
      .agg(sum($"c12").as("c1"), count(lit(1)).as("n1p"))
    val cont = bi.groupBy($"w2").agg(count(lit(1)).as("nc"))
    val tot = bi.agg(count(lit(1)).as("ntot"))
    bi.filter($"c12" >= 5)
      .join(left, "w1")
      .join(cont, "w2")
      .crossJoin(broadcast(tot)) // one row
      .select($"w1", $"w2", $"c12",
        (round((greatest($"c12" - lit(0.75), lit(0.0)) / $"c1"
          + lit(0.75) * $"n1p" / $"c1" * $"nc" / $"ntot") * lit(1e9))
          .cast("long").cast("double") / lit(1e9)).as("p_kn"))
      .orderBy($"w1", $"w2")
  }
  val q278Sql: String =
    """WITH bi AS MATERIALIZED (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM (
      |    SELECT t[i] AS w1, t[i+1] AS w2
      |    FROM (SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |          FROM documents),
      |         unnest(range(1, len(t))) AS u(i)
      |    WHERE len(t) >= 2)
      |  GROUP BY w1, w2),
      |lft AS (
      |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
      |    CAST(COUNT(*) AS BIGINT) AS n1p
      |  FROM bi GROUP BY w1),
      |cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nc FROM bi GROUP BY w2),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM bi)
      |SELECT w1, w2, c12,
      |  CAST(CAST(ROUND((GREATEST(c12 - 0.75, 0.0) / c1
      |    + 0.75 * n1p / c1 * nc / ntot) * 1e9) AS BIGINT) AS DOUBLE) / 1e9
      |    AS p_kn
      |FROM bi
      |JOIN lft USING (w1) JOIN cont USING (w2) CROSS JOIN tot
      |WHERE c12 >= 5
      |ORDER BY w1, w2""".stripMargin

  // --- q280: out-of-vocabulary rate audit (train vocab vs holdout) ---------
  // The coverage check run before freezing any tokenizer or vocabulary:
  // build the vocab from the TRAIN split (doc_id parity — the q89/q216
  // hash-split convention), then measure what fraction of HOLDOUT tokens
  // it cannot represent, per source (a source with an outlying OOV rate
  // is drifted or mis-normalized). Pure integer arithmetic end to end:
  // token counts are exact longs and the rate is an integral-div ppm
  // (the q260 convention). Shape: one tokenize pass per split; the
  // membership test is a vocab-keyed left join (Heaps-bounded build
  // side), corpus-sized probe with map-side pre-aggregation on
  // (source, token).
  def q280(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val vocab = docs.filter($"doc_id" % 2 === 0)
      .select(explode(tokens($"text")).as("w")).distinct()
    docs.filter($"doc_id" % 2 === 1)
      .select($"source", explode(tokens($"text")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("n"))
      .join(vocab.withColumn("hit", lit(1L)), Seq("w"), "left")
      .groupBy($"source")
      .agg(sum($"n").as("n_tokens"),
        sum(when($"hit".isNull, $"n").otherwise(0L)).as("n_oov"))
      .select($"source", $"n_tokens", $"n_oov",
        // decimal(38,0) numerator — same overflow class as q296/q307
        expr("cast(n_oov as decimal(38,0)) * 1000000 div n_tokens")
          .cast("long").as("oov_ppm"))
      .orderBy($"source")
  }
  val q280Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
      |  FROM documents),
      |vocab AS (SELECT DISTINCT w FROM toks WHERE doc_id % 2 = 0),
      |hold AS (
      |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM toks WHERE doc_id % 2 = 1 GROUP BY 1, 2)
      |SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN vocab.w IS NULL THEN n ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  CAST(CAST(SUM(CASE WHEN vocab.w IS NULL THEN n ELSE 0 END) AS HUGEINT)
      |    * 1000000 // SUM(n) AS BIGINT) AS oov_ppm
      |FROM hold LEFT JOIN vocab ON hold.w = vocab.w
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // --- q290: leave-one-source-out data valuation ----------------------------
  // The cheapest honest answer to "what does source s contribute": for
  // every source, recompute corpus health metrics WITHOUT it — from
  // totals minus per-source partials, so the sweep costs one corpus pass
  // plus source-count-sized arithmetic, never S rescans. Two metrics: the
  // mean tokens-per-doc (integral ppm) and the exact-duplicate count,
  // whose LOSO form needs the one non-obvious piece: removing s deletes a
  // distinct text only when s holds ALL its copies, so distinct-without-s
  // = D − |{hashes fully contained in s}| — computed from the hash×source
  // count grid, all exact integers. A source whose removal RAISES mean
  // length and LOWERS the dup rate is a candidate cut; guards emit NULL
  // when a source is the whole corpus (the q273 degenerate-input rule).
  def q290(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.CacheLifecycle.TrackedPersistOps
    val docs = Tables.documents(s, d)
      .select($"doc_id", $"source", md5($"text").as("h"),
        size(tokens($"text")).cast("long").as("tk"))
      .persistTracked() // four grid consumers below
    val bySrc = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_s"), sum($"tk").as("t_s"))
    val tot = docs.agg(count(lit(1)).as("nn"), sum($"tk").as("tt"),
      countDistinct($"h").as("dd"))
    val hc = docs.groupBy($"h").agg(count(lit(1)).as("c"))
    val contained = docs.groupBy($"source", $"h").agg(count(lit(1)).as("cs"))
      .join(hc, "h").filter($"cs" === $"c")
      .groupBy($"source").agg(count(lit(1)).as("f_s"))
    bySrc.join(contained, Seq("source"), "left")
      .withColumn("f_s", coalesce($"f_s", lit(0L)))
      .crossJoin(broadcast(tot)) // one row
      .select($"source", $"n_s",
        expr("cast(tt as decimal(38,0)) * 1000000 div nn").cast("long")
          .as("tok_mean_all_ppm"),
        when($"nn" > $"n_s",
          expr("cast(tt - t_s as decimal(38,0)) * 1000000 div (nn - n_s)")
            .cast("long")).as("tok_mean_wo_ppm"),
        ($"nn" - $"dd").as("n_dups_all"),
        (($"nn" - $"n_s") - ($"dd" - $"f_s")).as("n_dups_wo"))
      .orderBy($"source")
  }
  val q290Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, md5(text) AS h,
      |    CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS BIGINT) AS tk
      |  FROM documents),
      |by_src AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
      |    CAST(SUM(tk) AS BIGINT) AS t_s
      |  FROM docs GROUP BY source),
      |tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(tk) AS BIGINT) AS tt,
      |    CAST(COUNT(DISTINCT h) AS BIGINT) AS dd
      |  FROM docs),
      |hc AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM docs GROUP BY h),
      |contained AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS f_s FROM (
      |    SELECT d.source, d.h, COUNT(*) AS cs FROM docs d GROUP BY 1, 2) g
      |  JOIN hc ON g.h = hc.h
      |  WHERE cs = c GROUP BY source)
      |SELECT source, n_s,
      |  CAST(CAST(tt AS HUGEINT) * 1000000 // nn AS BIGINT) AS tok_mean_all_ppm,
      |  CASE WHEN nn > n_s THEN
      |    CAST(CAST(tt - t_s AS HUGEINT) * 1000000 // (nn - n_s) AS BIGINT)
      |  END AS tok_mean_wo_ppm,
      |  nn - dd AS n_dups_all,
      |  (nn - n_s) - (dd - COALESCE(f_s, 0)) AS n_dups_wo
      |FROM by_src LEFT JOIN contained USING (source) CROSS JOIN tot
      |ORDER BY source""".stripMargin

  // --- q294: context-window truncation loss ---------------------------------
  // The sizing table read before fixing a training context length: for
  // each candidate window, how many documents overflow it and what share
  // of corpus TOKENS a hard truncation throws away (the statistic that
  // decides window size vs packing strategy, q88's companion). One
  // corpus tokenize-count pass; the window dimension is a 4-row
  // broadcast explode, so cost is independent of how many candidate
  // sizes are probed. Integral ppm end-to-end.
  def q294(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lens = Tables.documents(s, d)
      .select($"doc_id", size(tokens($"text")).cast("long").as("tk"))
    val wins = Seq(128L, 256L, 512L, 1024L).toDF("win")
    lens.crossJoin(broadcast(wins))
      .groupBy($"win")
      .agg(count(lit(1)).as("n_docs"),
        sum($"tk").as("n_tokens"),
        sum(when($"tk" > $"win", 1L).otherwise(0L)).as("n_truncated"),
        sum(when($"tk" > $"win", $"tk" - $"win").otherwise(0L)).as("tokens_lost"))
      .select($"win", $"n_docs", $"n_truncated", $"tokens_lost",
        expr("cast(tokens_lost as decimal(38,0)) * 1000000 div n_tokens")
          .cast("long").as("lost_ppm"))
      .orderBy($"win")
  }
  val q294Sql: String =
    """WITH lens AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS BIGINT) AS tk
      |  FROM documents),
      |wins AS (SELECT unnest([128, 256, 512, 1024]) AS win)
      |SELECT CAST(win AS BIGINT) AS win, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN tk > win THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
      |  CAST(SUM(CASE WHEN tk > win THEN tk - win ELSE 0 END) AS BIGINT)
      |    AS tokens_lost,
      |  CAST(CAST(SUM(CASE WHEN tk > win THEN tk - win ELSE 0 END) AS HUGEINT)
      |    * 1000000 // SUM(tk) AS BIGINT) AS lost_ppm
      |FROM lens CROSS JOIN wins
      |GROUP BY win
      |ORDER BY win""".stripMargin

  // --- q306: data scaling curve (subsample → vocabulary/duplication) --------
  // The empirical learning-curve input every "do we need more data"
  // decision reads: at deterministic 25/50/75/100 % subsamples (md5
  // buckets — the q89/q112 portable split), how do corpus volume,
  // DISTINCT vocabulary (Heaps-law growth), and the exact-duplicate rate
  // scale? Nested subsamples by construction (bucket < k·25 ⊃ bucket <
  // (k−1)·25) so the curve is monotone in docs/tokens by design and the
  // vocab curve's concavity is the Heaps signal. One tokenize pass;
  // per-fraction aggregation over bucket-filtered views.
  def q306(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.CacheLifecycle.TrackedPersistOps
    val docs = Tables.documents(s, d)
      .withColumn("bkt",
        conv(substring(md5(concat(lit("curve|"), $"doc_id".cast("string"))),
          1, 14), 16, 10).cast("long") % 100)
      .select($"doc_id", $"bkt", md5($"text").as("h"),
        explode(tokens($"text")).as("w"))
      .persistTracked() // four fraction consumers
    val fr = Seq(25L, 50L, 75L, 100L).toDF("pct")
    docs.crossJoin(broadcast(fr))
      .filter($"bkt" < $"pct")
      .groupBy($"pct")
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_tokens"),
        countDistinct($"w").as("n_vocab"),
        (countDistinct($"doc_id") - countDistinct($"h")).as("n_dups"))
      .orderBy($"pct")
  }
  val q306Sql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5('curve|' || CAST(doc_id AS VARCHAR)),
      |      1, 14))::BIGINT % 100 AS BIGINT) AS bkt,
      |    md5(text) AS h,
      |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
      |  FROM documents)
      |SELECT pct, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT w) AS BIGINT) AS n_vocab,
      |  CAST(COUNT(DISTINCT doc_id) - COUNT(DISTINCT h) AS BIGINT) AS n_dups
      |FROM docs
      |CROSS JOIN (SELECT unnest([25, 50, 75, 100]) AS pct) f
      |WHERE bkt < pct
      |GROUP BY pct
      |ORDER BY pct""".stripMargin

  // --- q307: effective dataset size after near-dup dedup --------------------
  // The number that prices a dedup pass: of the corpus's raw tokens, how
  // many survive cluster-canonical dedup (q82's near-dup clusters, q205's
  // keep-one policy — here the structural min-id representative)? Reported
  // per source with kept-token ppm — the honest "effective size" a
  // trainer sees after curation. Joins the staged cluster table (already
  // proven by q82's oracle) to token counts; everything after the
  // tokenize pass is source-count-sized.
  def q307(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"doc_id", $"source", size(tokens($"text")).cast("long").as("tk"))
    // INNER join: the accounting universe is the clusterable corpus (docs
    // with ≥3 tokens — exactly the cluster table's domain; shorter docs
    // have no shingles to deduplicate on)
    toks.join(stagedClusters(s, d).select($"doc_id", $"is_canonical"),
        Seq("doc_id"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"is_canonical", 1L).otherwise(0L)).as("n_kept"),
        sum($"tk").as("n_tokens"),
        sum(when($"is_canonical", $"tk").otherwise(0L)).as("kept_tokens"))
      .select($"source", $"n_docs", $"n_kept", $"n_tokens", $"kept_tokens",
        // decimal(38,0) numerator — kept-token ppm at corpus scale (q290 route)
        expr("cast(kept_tokens as decimal(38,0)) * 1000000 div n_tokens")
          .cast("long").as("kept_ppm"))
      .orderBy($"source")
  }
  val q307Sql: String = {
    // q82's recursive-CTE clustering (the staged table's oracle), then the
    // keep-canonical accounting per source
    val clusters = q82Sql.stripSuffix("ORDER BY doc_id").trim
    s"""WITH cl AS MATERIALIZED (
       |$clusters
       |),
       |toks AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT) AS tk
       |  FROM documents)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(tk) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN is_canonical THEN tk ELSE 0 END) AS BIGINT)
       |    AS kept_tokens,
       |  CAST(CAST(SUM(CASE WHEN is_canonical THEN tk ELSE 0 END) AS HUGEINT)
       |    * 1000000 // SUM(tk) AS BIGINT) AS kept_ppm
       |FROM toks JOIN cl USING (doc_id)
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // --- q233: weighted negative sampling (unigram^0.75 inverse-CDF) ---------
  // The word2vec / contrastive-training sampling primitive (Mikolov 2013):
  // draw K=4 negatives per document from the unigram distribution raised
  // to 0.75 (down-weights stopwords without discarding them). Everything
  // is deterministic and cross-engine exact: weights snap pow(cnt, 0.75)
  // to a 1e-6 integer grid (the q106 transcendental-snap convention), the
  // vocab CDF is an integer prefix sum in the q49 sliced-prefix shape
  // (sliced on the first character — a prefix of the ordering key, so
  // slice-local sums compose), and each draw maps a 56-bit md5 uniform
  // through `target = u mod total` (modulo bias ≈ total/2^56 — identical
  // on both engines, so exactness is unconditional). The interval lookup
  // is NOT a nested-loop range join: vocab intervals explode onto
  // fixed-width buckets (≤ a few spans each) and draws equi-join their
  // bucket with a residual range filter — the q77 banded-join shape, so
  // the work is draws + vocab, never draws × vocab. The oracle restates
  // the draw with DuckDB's plain interval join over the same CDF.
  def q233(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val vocab = docs.select(explode(tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .withColumn("w", round(pow($"cnt", 0.75) * 1e6).cast("long"))
    val wLocal = Window.partitionBy($"slice").orderBy($"tok")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wSlices = Window.orderBy($"slice")
      .rowsBetween(Window.unboundedPreceding, 0)
    val sliced = vocab.withColumn("slice", ascii(substring($"tok", 1, 1)))
    val offsets = sliced.groupBy($"slice").agg(sum($"w").as("st"))
      .withColumn("off", sum($"st").over(wSlices) - $"st")
      .select($"slice", $"off")
    // persist: three consumers (the width constant, the bucket explode,
    // and the total) would otherwise each re-run the corpus tokenization
    // feeding the vocab aggregation (measured 5.6 s -> 1.9 s at sf0.1);
    // vocab-sized by Heaps' law, LRU-evicted per CacheLifecycle
    import graft.CacheLifecycle.TrackedPersistOps
    val cdf = sliced
      .withColumn("lc", sum($"w").over(wLocal))
      .join(broadcast(offsets), "slice")
      .select($"tok", $"cnt", $"w", ($"off" + $"lc").as("cum_hi"))
      .persistTracked()
    val tot = cdf.agg(sum($"w").as("t"))
    val buckets = 1024
    val width = tot.select((($"t" + buckets - 1) / buckets).cast("long"))
      .head.getLong(0) // one-row driver constant: the bucket width
    val vocabB = cdf
      .withColumn("b", explode(expr(
        s"sequence((cum_hi - w) div ${width}L, (cum_hi - 1) div ${width}L)")))
    val draws = docs.select($"doc_id",
        explode(sequence(lit(0), lit(3))).as("k"))
      .crossJoin(broadcast(tot)) // one-row bound
      .withColumn("target",
        conv(substring(md5(concat(lit("neg|"), $"doc_id".cast("string"),
          lit("|"), $"k".cast("string"))), 1, 14), 16, 10).cast("long") % $"t")
      .withColumn("b", expr(s"target div ${width}L"))
    draws.join(vocabB, "b")
      .filter($"target" >= $"cum_hi" - $"w" && $"target" < $"cum_hi")
      .groupBy($"tok", $"cnt")
      .agg(count(lit(1)).as("n_drawn"))
      .orderBy($"n_drawn".desc, $"tok")
      .limit(20)
  }
  val q233Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |  FROM documents),
      |vocab AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt,
      |    CAST(round(pow(COUNT(*), 0.75) * 1e6) AS BIGINT) AS w
      |  FROM toks GROUP BY tok),
      |cdf AS (
      |  SELECT tok, cnt, w,
      |    CAST(SUM(w) OVER (ORDER BY tok
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_hi
      |  FROM vocab),
      |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS t FROM vocab),
      |draws AS (
      |  SELECT doc_id, k.k,
      |    ('0x' || substr(md5('neg|' || CAST(doc_id AS VARCHAR) || '|'
      |      || CAST(k.k AS VARCHAR)), 1, 14))::BIGINT % tot.t AS target
      |  FROM documents CROSS JOIN (SELECT UNNEST(range(4)) AS k) k, tot)
      |SELECT c.tok, c.cnt, CAST(COUNT(*) AS BIGINT) AS n_drawn
      |FROM draws d JOIN cdf c
      |  ON d.target >= c.cum_hi - c.w AND d.target < c.cum_hi
      |GROUP BY 1, 2
      |ORDER BY n_drawn DESC, c.tok
      |LIMIT 20""".stripMargin

  // --- q240: edit-distance similarity join (SymSpell deletion signatures) ---
  // Typo-candidate detection for vocabulary normalization: every pair of
  // distinct corpus tokens within Levenshtein distance 2 — the cleanup
  // pass an OCR/web-scrape ingest runs before tokenizer training so
  // "tokenizaton" doesn't get its own vocab slot. The naive shape is an
  // all-pairs vocab² self-join with an edit-distance filter; the scale
  // shape is symmetric-delete candidate generation (Garbe's SymSpell;
  // the deletion-only variant of Mor & Fraenkel 1982): lev(a,b) ≤ d iff
  // deleting ≤ d chars from each can reach a COMMON string (any alignment
  // turns substitutions into one delete on each side and indels into one
  // delete on one side). So: explode each vocab word into its ≤2-deletion
  // neighborhood (1 + L + C(L,2) signatures — tiny, Zipf vocab ≪ corpus),
  // equi-join on the signature, and verify survivors with one exact
  // levenshtein call. The verify step makes the blocking LOSSLESS, so the
  // oracle can state the brute-force all-pairs truth and must agree
  // exactly. Words shorter than 3 chars are excluded (standard SymSpell
  // floor: their neighborhoods include "" which would bucket every short
  // word together — a hot-signature skew trap with no retrieval value).
  // 100 TB: vocab-sized work end-to-end; the signature join's hot buckets
  // are bounded by alphabet geometry, and the final distinct is over
  // candidate pairs, not vocab².
  def q240(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .filter(length($"w") >= 3)
      .distinct()
    // ≤2-deletion neighborhood: the word, every 1-deletion, every
    // 2-deletion (i < j, both 1-based; sequence() would run DESCENDING
    // for start > stop, hence the i < length guard).
    // persist: vocab×(1+L+C(L,2)) rows — small under Zipf — but BOTH join
    // sides would otherwise re-run the corpus explode+distinct scan.
    // LRU-evicted via the CacheLifecycle contract.
    import graft.CacheLifecycle.TrackedPersistOps
    val sigs = vocab.select($"w", explode(array_distinct(concat(
      array($"w"),
      expr("transform(sequence(1, length(w)), i -> " +
        "concat(substring(w, 1, i - 1), substring(w, i + 1, length(w))))"),
      flatten(expr("transform(sequence(1, length(w)), i -> " +
        "case when i < length(w) then transform(sequence(i + 1, length(w)), j -> " +
        "concat(substring(w, 1, i - 1), substring(w, i + 1, j - i - 1), " +
        "substring(w, j + 1, length(w)))) else array() end)"))))).as("sig"))
      .persistTracked()
    sigs.as("a").join(sigs.as("b"),
        $"a.sig" === $"b.sig" && $"a.w" < $"b.w")
      .select($"a.w".as("word_a"), $"b.w".as("word_b"))
      .distinct()
      .withColumn("dist", levenshtein($"word_a", $"word_b").cast("long"))
      .filter($"dist" <= 2)
      .orderBy($"word_a", $"word_b")
  }
  val q240Sql: String =
    """WITH v AS (
      |  SELECT DISTINCT w FROM (
      |    SELECT unnest(string_split(norm, ' ')) AS w
      |    FROM (SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
      |            AS norm FROM documents))
      |  WHERE length(w) >= 3)
      |SELECT a.w AS word_a, b.w AS word_b,
      |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
      |FROM v a JOIN v b ON a.w < b.w
      |WHERE levenshtein(a.w, b.w) <= 2
      |ORDER BY word_a, word_b""".stripMargin

  // --- q243: Good-Turing count-of-counts smoothing ---------------------------
  // The LM-estimation step under q39's surprisal and q198's bigram LM:
  // simple Good-Turing frequency re-estimation (Good 1953; Gale & Sampson
  // 1995's presentation) from the count-of-counts table — r* =
  // (r+1)·N_{r+1}/N_r for rare counts, plus N_1/N as the unseen-mass
  // estimate baked into every Katz-backoff tokenizer/LM pipeline. The
  // count-of-counts table is tiny by construction (≤ #distinct counts),
  // so after the corpus token count everything is free. N_{r+1} comes
  // from a self EQUI-join on r+1, not lead(): lead() returns the next
  // PRESENT r, which is wrong across gaps — absent N_{r+1} means r* = 0
  // (the classic GT gap; smoothing N_r itself, à la Gale-Sampson, is out
  // of scope and documented). Restricted to the 20 SMALLEST counts
  // present (rank over the tiny count-of-counts table, not a fixed r ≤ 20
  // — this synthetic corpus has no singletons at all): GT is for rare
  // counts; MLE is fine above (standard practice). Integer-grid ratios;
  // the r·N_r·1e6 mass product is decimal(38,0)-snapped (q154 rule —
  // r reaches corpus scale when the vocab is small).
  def q243(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wc = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val coc = wc.groupBy($"c".as("r")).agg(count(lit(1)).as("n_r"))
      .persistTracked() // two consumers: the r+1 probe side and the base
    val tot = wc.agg(sum($"c").as("n_total"), count(lit(1)).as("n_vocab"))
    val nxt = coc.select(($"r" - 1).as("r"), $"n_r".as("n_r1"))
    val big = "decimal(38,0)"
    coc.join(nxt, Seq("r"), "left")
      .withColumn("rk", row_number().over(Window.orderBy($"r")))
      .filter($"rk" <= 20).drop("rk")
      .crossJoin(broadcast(tot)) // one row
      .select($"r", $"n_r",
        expr(s"cast((cast(r + 1 as $big) * coalesce(n_r1, 0) * 1000000)" +
          s" div cast(n_r as $big) as bigint)").as("r_star_ppm"),
        expr(s"cast((cast(n_r as $big) * r * 1000000)" +
          s" div cast(n_total as $big) as bigint)").as("mass_ppm"),
        $"n_vocab")
      .orderBy($"r")
  }
  val q243Sql: String =
    """WITH wc AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(string_split(lower(trim(
      |      regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
      |    FROM documents)
      |  GROUP BY w),
      |coc AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r
      |        FROM wc GROUP BY c),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total,
      |          CAST(COUNT(*) AS BIGINT) AS n_vocab FROM wc),
      |joined AS (
      |  SELECT base.r, base.n_r, nxt.n_r AS n_r1,
      |    ROW_NUMBER() OVER (ORDER BY base.r) AS rk
      |  FROM coc base LEFT JOIN coc nxt ON nxt.r = base.r + 1)
      |SELECT r, n_r,
      |  CAST((CAST(r + 1 AS HUGEINT) * COALESCE(n_r1, 0) * 1000000)
      |    // CAST(n_r AS HUGEINT) AS BIGINT) AS r_star_ppm,
      |  CAST((CAST(n_r AS HUGEINT) * r * 1000000)
      |    // CAST(n_total AS HUGEINT) AS BIGINT) AS mass_ppm,
      |  n_vocab
      |FROM joined CROSS JOIN tot
      |WHERE rk <= 20
      |ORDER BY r""".stripMargin

  // --- q244: feature hashing (the hashing trick) ------------------------------
  // The streaming-friendly featurizer (Weinberger et al. 2009): project
  // the unbounded token space onto 64 fixed columns via bucket =
  // hash(token) mod 64 with a second hash bit choosing ±1, so collisions
  // cancel in expectation and the estimator stays unbiased — the exact
  // construction Vowpal Wabbit / sklearn's HashingVectorizer use, and the
  // only featurizer that needs NO vocabulary pass (a must when the vocab
  // itself won't fit or drifts under streaming ingest). Hash = the repo's
  // md5-prefix convention, restated verbatim in DuckDB. Output is the
  // per-bucket health summary (occupancy, mass, signed sum — collision
  // diagnostics), bounded at 64 rows at any corpus size; per-(doc,bucket)
  // vectors are the obvious intermediate and stay distributed. Shape: one
  // explode + two hash aggregations, all map-side combinable, zero joins.
  def q244(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tok = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tc"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("fh|"), $"w")), 1, 14), 16, 10)
          .cast("long") % 64)
      .withColumn("sgn",
        conv(substring(md5(concat(lit("fh|"), $"w")), 15, 1), 16, 10)
          .cast("long") % 2 * 2 - 1)
    val byBucket = tok.groupBy($"doc_id", $"bucket")
      .agg(sum($"sgn" * $"tc").as("signed"), sum($"tc").as("mass"))
      .groupBy($"bucket")
      .agg(countDistinct($"doc_id").as("n_docs"),
        sum($"mass").as("total_mass"),
        sum($"signed").as("total_signed"),
        sum(abs($"signed")).as("total_abs_signed"))
    // per-bucket vocabulary load (collision-diagnostic) from a separate
    // vocab-sized aggregation — NOT a persist of the doc×token table,
    // which is corpus-sized and must stay streaming-through at 100 TB
    val terms = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w")).distinct()
      .withColumn("bucket",
        conv(substring(md5(concat(lit("fh|"), $"w")), 1, 14), 16, 10)
          .cast("long") % 64)
      .groupBy($"bucket").agg(count(lit(1)).as("n_terms"))
    byBucket.join(broadcast(terms), "bucket")
      .select($"bucket", $"n_terms", $"n_docs", $"total_mass",
        $"total_signed", $"total_abs_signed")
      .orderBy($"bucket")
  }
  val q244Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tc FROM (
      |    SELECT doc_id, unnest(string_split(lower(trim(
      |      regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
      |    FROM documents)
      |  GROUP BY doc_id, w),
      |hashed AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5('fh|' || w), 1, 14))::BIGINT % 64 AS bucket,
      |    (('0x' || substr(md5('fh|' || w), 15, 1))::BIGINT % 2) * 2 - 1
      |      AS sgn, tc
      |  FROM tok),
      |cell AS (
      |  SELECT doc_id, bucket, CAST(SUM(sgn * tc) AS BIGINT) AS signed,
      |    CAST(SUM(tc) AS BIGINT) AS mass
      |  FROM hashed GROUP BY 1, 2),
      |byb AS (
      |  SELECT bucket, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |    CAST(SUM(mass) AS BIGINT) AS total_mass,
      |    CAST(SUM(signed) AS BIGINT) AS total_signed,
      |    CAST(SUM(ABS(signed)) AS BIGINT) AS total_abs_signed
      |  FROM cell GROUP BY bucket),
      |terms AS (
      |  SELECT ('0x' || substr(md5('fh|' || w), 1, 14))::BIGINT % 64
      |      AS bucket, CAST(COUNT(*) AS BIGINT) AS n_terms
      |  FROM (SELECT DISTINCT w FROM tok) GROUP BY 1)
      |SELECT bucket, n_terms, n_docs, total_mass, total_signed,
      |  total_abs_signed
      |FROM byb JOIN terms USING (bucket)
      |ORDER BY bucket""".stripMargin

  // --- q256: Heaps-law vocabulary growth curve --------------------------------
  // Corpus statistics for tokenizer/vocab budgeting (Heaps 1978): vocab
  // size V(n) ≈ K·n^β as a function of tokens seen — the curve that says
  // how much NEW vocabulary the next 10× of corpus will bring. Exact
  // prefix statistics without any sequential scan: a token's first
  // occurrence is min(doc_id) (vocab-sized agg), a prefix's token count
  // is a sum over doc_id — both collapse onto power-of-two checkpoints
  // via a constant-folded CASE ladder (the q237 Benford-ladder idiom:
  // never floor(log2(double)), whose ulp error flips exactly at the
  // power-of-two boundaries the bucket depends on), and checkpoint
  // cumsums run over the ≤64-row grid. β comes from OLS of ln V on ln n
  // across checkpoints: ln values snapped to the 1e-9 grid as longs, OLS
  // moments as exact decimal(38,0)/HUGEINT sums (the e9 scale cancels in
  // the slope ratio), one double division at the end snapped back to the
  // grid. Assumes doc_id is the ingest order (true of this corpus and
  // documented): "the first k docs" = doc_id < k.
  private def pow2Ladder(col: String): String = (0 to 40)
    .map(i => s"WHEN $col < ${1L << i} THEN ${1L << i}")
    .mkString("CASE ", " ", " END")
  def q256(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = "decimal(38,0)"
    val docs = Tables.documents(s, d)
    val perDoc = docs.select($"doc_id", size(tokens($"text")).as("n_toks"))
      .select(expr(pow2Ladder("doc_id")).as("k"), $"n_toks")
      .groupBy($"k").agg(count(lit(1)).as("d_docs"), sum($"n_toks").as("d_toks"))
    val firstDoc = docs.select($"doc_id", explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(min($"doc_id").as("fd"))
      .select(expr(pow2Ladder("fd")).as("k"))
      .groupBy($"k").agg(count(lit(1)).as("d_vocab"))
    val cum = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = perDoc.join(firstDoc, Seq("k"), "full_outer")
      .select($"k", coalesce($"d_docs", lit(0L)).as("d_docs"),
        coalesce($"d_toks", lit(0L)).as("d_toks"),
        coalesce($"d_vocab", lit(0L)).as("d_vocab"))
      .withColumn("n_docs", sum($"d_docs").over(cum))
      .withColumn("n_tokens", sum($"d_toks").over(cum))
      .withColumn("n_vocab", sum($"d_vocab").over(cum))
      .withColumn("x_e9", round(log($"n_tokens") * lit(1e9)).cast("long"))
      .withColumn("y_e9", round(log($"n_vocab") * lit(1e9)).cast("long"))
    // persist: ≤64 rows behind two corpus-sized scans; the OLS branch
    // and the output projection both consume it (CacheLifecycle contract)
    val g = grid.persistTracked()
    val beta = g.agg(count(lit(1)).as("m"),
        sum($"x_e9".cast(big)).as("sx"), sum($"y_e9".cast(big)).as("sy"),
        sum($"x_e9".cast(big) * $"x_e9".cast(big)).as("sxx"),
        sum($"x_e9".cast(big) * $"y_e9".cast(big)).as("sxy"))
      .select((round(((($"m" * $"sxy" - $"sx" * $"sy").cast("double"))
        / (($"m" * $"sxx" - $"sx" * $"sx").cast("double"))) * lit(1e9))
        .cast("long").cast("double") / lit(1e9)).as("heaps_beta"))
    g.crossJoin(broadcast(beta)) // one row
      .select($"k".as("k_docs"), $"n_docs", $"n_tokens", $"n_vocab",
        $"heaps_beta")
      .orderBy($"k_docs")
  }
  val q256Sql: String = {
    val ladderFd = pow2Ladder("fd")
    val ladderDoc = pow2Ladder("doc_id")
    s"""WITH dd AS (
       |  SELECT doc_id, len(string_split(lower(trim(
       |    regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS n_toks
       |  FROM documents),
       |perdoc AS (
       |  SELECT $ladderDoc AS k, CAST(COUNT(*) AS BIGINT) AS d_docs,
       |    CAST(SUM(n_toks) AS BIGINT) AS d_toks
       |  FROM dd GROUP BY 1),
       |fd AS (
       |  SELECT w, MIN(doc_id) AS fd FROM (
       |    SELECT doc_id, unnest(string_split(lower(trim(
       |      regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
       |    FROM documents)
       |  GROUP BY w),
       |firstdoc AS (
       |  SELECT $ladderFd AS k, CAST(COUNT(*) AS BIGINT) AS d_vocab
       |  FROM fd GROUP BY 1),
       |grid AS (
       |  SELECT COALESCE(perdoc.k, firstdoc.k) AS k,
       |    COALESCE(d_docs, 0) AS d_docs, COALESCE(d_toks, 0) AS d_toks,
       |    COALESCE(d_vocab, 0) AS d_vocab
       |  FROM perdoc FULL JOIN firstdoc ON perdoc.k = firstdoc.k),
       |cums AS (
       |  SELECT k,
       |    SUM(d_docs) OVER w AS n_docs,
       |    SUM(d_toks) OVER w AS n_tokens,
       |    SUM(d_vocab) OVER w AS n_vocab
       |  FROM grid
       |  WINDOW w AS (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW)),
       |pts AS (
       |  SELECT k, CAST(n_docs AS BIGINT) AS n_docs,
       |    CAST(n_tokens AS BIGINT) AS n_tokens,
       |    CAST(n_vocab AS BIGINT) AS n_vocab,
       |    CAST(ROUND(ln(n_tokens) * 1e9) AS BIGINT) AS x_e9,
       |    CAST(ROUND(ln(n_vocab) * 1e9) AS BIGINT) AS y_e9
       |  FROM cums),
       |ols AS (
       |  SELECT CAST(CAST(ROUND(
       |      CAST(COUNT(*) * SUM(CAST(x_e9 AS HUGEINT) * y_e9)
       |        - SUM(CAST(x_e9 AS HUGEINT)) * SUM(CAST(y_e9 AS HUGEINT))
       |        AS DOUBLE)
       |      / CAST(COUNT(*) * SUM(CAST(x_e9 AS HUGEINT) * x_e9)
       |        - SUM(CAST(x_e9 AS HUGEINT)) * SUM(CAST(x_e9 AS HUGEINT))
       |        AS DOUBLE) * 1e9) AS BIGINT) AS DOUBLE) / 1e9
       |    AS heaps_beta
       |  FROM pts)
       |SELECT k AS k_docs, n_docs, n_tokens, n_vocab, heaps_beta
       |FROM pts CROSS JOIN ols
       |ORDER BY k_docs""".stripMargin
  }

  // --- q272: Yule's K (vocabulary-richness constant) ------------------------------
  // The third corpus-health constant beside q256's Heaps β and q259's
  // Zipf slope: Yule's characteristic K = 10⁴·(Σ_r r²·N_r − N)/N²
  // (Yule 1944) — repetition-insensitive vocabulary richness, the
  // stylometry-standard scalar (K is invariant to corpus LENGTH, unlike
  // type-token ratio, so per-source values are comparable across sources
  // of different sizes — exactly what a mixing pipeline needs). Per
  // source, from each source's count-of-counts. Exactness: Σ r²·N_r is
  // an exact decimal/HUGEINT sum, but ×10⁴ would overflow the 38-digit
  // grid at corpus scale, so K is ONE fixed double chain from the exact
  // decimal parts snapped at 1e-6 (the q158 rule). Work: token count →
  // per-source count-of-counts (tiny) → one row per source.
  def q272(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = "decimal(38,0)"
    val wc = Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
    wc.groupBy($"source")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("n_vocab"),
        sum($"c".cast(big) * $"c".cast(big)).as("s2"))
      .select($"source", $"n_tokens", $"n_vocab",
        (round((($"s2".cast("double") - $"n_tokens")
          / $"n_tokens" / $"n_tokens" * lit(1e4)) * lit(1e6))
          .cast("long").cast("double") / lit(1e6)).as("yule_k"))
      .orderBy($"source")
  }
  val q272Sql: String =
    """WITH wc AS (
      |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |    SELECT source, unnest(string_split(lower(trim(
      |      regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
      |    FROM documents)
      |  GROUP BY 1, 2)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_vocab,
      |  CAST(CAST(ROUND((CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
      |      - CAST(SUM(c) AS BIGINT))
      |    / CAST(SUM(c) AS BIGINT) / CAST(SUM(c) AS BIGINT) * 1e4 * 1e6)
      |    AS BIGINT) AS DOUBLE) / 1e6 AS yule_k
      |FROM wc GROUP BY source
      |ORDER BY source""".stripMargin

  // --- q259: Zipf-law fit (rank-frequency slope) --------------------------------
  // q256's sibling law (Zipf 1949): token frequency ≈ C·rank^(−s); the
  // fitted slope s says whether a corpus has a natural long tail (s ≈ 1)
  // or is template spam (s far off) — a one-number corpus-health check
  // next to q117's Gini. Rank = row_number over (count DESC, word) — a
  // TOTAL order, so ranks are deterministic under ties (the q235 rule) —
  // over the vocab-sized count table; the fit is OLS of ln(freq) on
  // ln(rank), e9-snapped longs with decimal(38,0)/HUGEINT moments and one
  // final double division (the q256 chain verbatim). Output: the top-20
  // rank table with the fitted slope and intercept broadcast onto it.
  def q259(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = "decimal(38,0)"
    val wc = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val ranked = wc
      .withColumn("rank",
        row_number().over(Window.orderBy($"c".desc, $"w")).cast("long"))
      .withColumn("x_e9", round(log($"rank") * lit(1e9)).cast("long"))
      .withColumn("y_e9", round(log($"c") * lit(1e9)).cast("long"))
      .persistTracked() // OLS branch + top-20 projection
    val fit = ranked.agg(count(lit(1)).as("m"),
        sum($"x_e9".cast(big)).as("sx"), sum($"y_e9".cast(big)).as("sy"),
        sum($"x_e9".cast(big) * $"x_e9".cast(big)).as("sxx"),
        sum($"x_e9".cast(big) * $"y_e9".cast(big)).as("sxy"))
      .select(
        (round(((($"m" * $"sxy" - $"sx" * $"sy").cast("double"))
          / (($"m" * $"sxx" - $"sx" * $"sx").cast("double"))) * lit(1e9))
          .cast("long").cast("double") / lit(1e9)).as("zipf_slope"),
        $"m".as("n_vocab"))
    ranked.filter($"rank" <= 20)
      .crossJoin(broadcast(fit)) // one row
      .select($"rank", $"w", $"c".as("freq"), $"zipf_slope", $"n_vocab")
      .orderBy($"rank")
  }
  val q259Sql: String =
    """WITH wc AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(string_split(lower(trim(
      |      regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
      |    FROM documents)
      |  GROUP BY w),
      |ranked AS (
      |  SELECT w, c,
      |    CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT) AS rank
      |  FROM wc),
      |pts AS (
      |  SELECT rank, w, c,
      |    CAST(ROUND(ln(rank) * 1e9) AS BIGINT) AS x_e9,
      |    CAST(ROUND(ln(c) * 1e9) AS BIGINT) AS y_e9
      |  FROM ranked),
      |fit AS (
      |  SELECT CAST(CAST(ROUND(
      |      CAST(COUNT(*) * SUM(CAST(x_e9 AS HUGEINT) * y_e9)
      |        - SUM(CAST(x_e9 AS HUGEINT)) * SUM(CAST(y_e9 AS HUGEINT))
      |        AS DOUBLE)
      |      / CAST(COUNT(*) * SUM(CAST(x_e9 AS HUGEINT) * x_e9)
      |        - SUM(CAST(x_e9 AS HUGEINT)) * SUM(CAST(x_e9 AS HUGEINT))
      |        AS DOUBLE) * 1e9) AS BIGINT) AS DOUBLE) / 1e9 AS zipf_slope,
      |    CAST(COUNT(*) AS BIGINT) AS n_vocab
      |  FROM pts)
      |SELECT rank, w, c AS freq, zipf_slope, n_vocab
      |FROM pts CROSS JOIN fit
      |WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  // --- q335: sparse tf-idf cosine similarity join ---------------------------
  // The WEIGHTED-vector sibling of the set-based q83 and the dense q54:
  // document similarity over sparse tf-idf vectors through posting lists.
  // Weights live on the 1e-6 integer grid (round(tf·ln(N/df)·1e6) — the
  // q79 ln convention), so dot products and squared norms are exact
  // decimal integers; the one cosine division is IEEE over two
  // correctly-rounded casts, snapped once. Candidates = pairs sharing a
  // DISCRIMINATIVE token (2 ≤ df ≤ 32 — per-token fan-out bounded by
  // C(32,2), the documented DAAT pruning rule, stated identically in the
  // oracle); the full-vector rerank runs only on candidates (q45's
  // gating). One corpus shuffle builds the postings; the candidate join
  // is keyed on rare tokens only.
  def q335(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val tc = docs.select($"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val df = tc.groupBy($"tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w6 = tc.join(df, "tok").crossJoin(broadcast(n))
      .withColumn("w6",
        round($"tf" * log($"n_docs".cast("double") / $"df") * 1e6).cast("long"))
      .persistTracked() // norms + candidates + both rerank sides
    val norms = w6.groupBy($"doc_id")
      .agg(sqrt(sum($"w6".cast("decimal(38,0)") * $"w6").cast("double")).as("nrm"))
    val rare = w6.filter($"df" >= 2 && $"df" <= 32)
    val cand = rare.select($"tok", $"doc_id".as("doc_a"))
      .join(rare.select($"tok", $"doc_id".as("doc_b")), Seq("tok"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
    val dots = cand
      .join(w6.select($"doc_id".as("doc_a"), $"tok", $"w6".as("wa")), Seq("doc_a"))
      .join(w6.select($"doc_id".as("doc_b"), $"tok", $"w6".as("wb")),
        Seq("doc_b", "tok"))
      .groupBy($"doc_a", $"doc_b")
      .agg(sum($"wa".cast("decimal(38,0)") * $"wb").as("dot"))
    dots
      .join(norms.select($"doc_id".as("doc_a"), $"nrm".as("na")), Seq("doc_a"))
      .join(norms.select($"doc_id".as("doc_b"), $"nrm".as("nb")), Seq("doc_b"))
      .withColumn("cosine", round($"dot".cast("double") / ($"na" * $"nb"), 6))
      .filter($"cosine" >= 0.5)
      .select($"doc_a", $"doc_b", $"cosine")
      .orderBy($"doc_a", $"doc_b")
  }
  val q335Sql: String =
    """WITH tc AS MATERIALIZED (
      |  SELECT doc_id, tok, COUNT(*) AS tf
      |  FROM (SELECT doc_id,
      |          unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, tok),
      |dfreq AS MATERIALIZED (SELECT tok, COUNT(*) AS df FROM tc GROUP BY tok),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      |w6 AS MATERIALIZED (
      |  SELECT tc.doc_id, tc.tok, dfreq.df,
      |    CAST(round(tc.tf * ln(CAST(n_docs AS DOUBLE) / dfreq.df) * 1e6) AS BIGINT) AS w6
      |  FROM tc JOIN dfreq USING (tok) CROSS JOIN nn),
      |norms AS MATERIALIZED (
      |  SELECT doc_id, sqrt(CAST(SUM(CAST(w6 AS HUGEINT) * w6) AS DOUBLE)) AS nrm
      |  FROM w6 GROUP BY doc_id),
      |cand AS MATERIALIZED (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM w6 a JOIN w6 b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  WHERE a.df BETWEEN 2 AND 32 AND b.df BETWEEN 2 AND 32),
      |dots AS (
      |  SELECT c.doc_a, c.doc_b, SUM(CAST(wa.w6 AS HUGEINT) * wb.w6) AS dot
      |  FROM cand c
      |  JOIN w6 wa ON wa.doc_id = c.doc_a
      |  JOIN w6 wb ON wb.doc_id = c.doc_b AND wb.tok = wa.tok
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  ROUND(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6) AS cosine
      |FROM dots
      |JOIN norms na ON na.doc_id = doc_a
      |JOIN norms nb ON nb.doc_id = doc_b
      |WHERE ROUND(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  // --- q322: TextRank keyword extraction (PageRank on co-occurrence) -------
  // The classic unsupervised keyword extractor, built by composing two
  // audited engine pieces: the canonical tokenizer (TextFunctions — the
  // oracle-shared normalization) and operators.Graph.pageRank (q143's
  // exact 1e-9-integer-grid power iteration). Graph: adjacent-token
  // co-occurrence (window size 2), canonicalized unordered pairs with a
  // support floor of 2 (drops hapax noise and bounds the graph), expanded
  // to both directions so no node dangles. Adjacency never shuffles the
  // corpus by itself — the lead() runs inside per-doc windows (documents
  // are bounded; the doc_id shuffle is the same one every per-doc
  // aggregate pays), and everything after the pair groupBy is
  // vocabulary-sized. Two unrolled iterations, bit-reproducible ranks,
  // top-20 keywords; the oracle restates both iterations verbatim
  // (q143's CTE chain over the token-pair graph).
  def q322(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val adj = Tables.documents(s, d)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("nxt", lead($"tok", 1)
        .over(Window.partitionBy($"doc_id").orderBy($"pos")))
      .filter($"nxt".isNotNull && $"tok" =!= $"nxt")
    val pairs = adj
      .select(least($"tok", $"nxt").as("pa"), greatest($"tok", $"nxt").as("pb"))
      .groupBy($"pa", $"pb").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2)
    val edges = pairs.select($"pa".as("src"), $"pb".as("dst"))
      .unionByName(pairs.select($"pb".as("src"), $"pa".as("dst")))
    graft.operators.Graph.pageRank(edges, iters = 2)
      .select($"node".as("token"), $"deg",
        ($"pr9".cast("double") / 1e9).as("textrank"), $"pr9")
      .orderBy($"pr9".desc, $"token")
      .limit(20)
      .drop("pr9")
  }
  val q322Sql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |adj AS (
      |  SELECT least(t[CAST(i AS INT)], t[CAST(i AS INT) + 1]) AS pa,
      |    greatest(t[CAST(i AS INT)], t[CAST(i AS INT) + 1]) AS pb
      |  FROM docs, unnest(range(1, len(t))) AS u(i)
      |  WHERE t[CAST(i AS INT)] <> t[CAST(i AS INT) + 1]),
      |pairs AS (
      |  SELECT pa, pb FROM adj GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |edges AS (
      |  SELECT pa AS src, pb AS dst FROM pairs
      |  UNION ALL SELECT pb, pa FROM pairs),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
      |nv AS (SELECT COUNT(*) AS v FROM deg),
      |p0 AS (
      |  SELECT src AS node, deg, CAST(round(1e9 / v) AS BIGINT) AS pr9
      |  FROM deg CROSS JOIN nv),
      |s1 AS (
      |  SELECT e.dst,
      |    CAST(SUM(CAST(round(CAST(0.85 AS DOUBLE) * p.pr9 / p.deg) AS BIGINT)) AS BIGINT) AS s9
      |  FROM edges e JOIN p0 p ON e.src = p.node GROUP BY e.dst),
      |p1 AS (
      |  SELECT d.src AS node, d.deg,
      |    CAST(round(CAST(0.15 AS DOUBLE) * 1e9 / v) AS BIGINT) + s9 AS pr9
      |  FROM deg d JOIN s1 ON d.src = s1.dst CROSS JOIN nv),
      |s2 AS (
      |  SELECT e.dst,
      |    CAST(SUM(CAST(round(CAST(0.85 AS DOUBLE) * p.pr9 / p.deg) AS BIGINT)) AS BIGINT) AS s9
      |  FROM edges e JOIN p1 p ON e.src = p.node GROUP BY e.dst),
      |p2 AS (
      |  SELECT d.src AS node, d.deg,
      |    CAST(round(CAST(0.15 AS DOUBLE) * 1e9 / v) AS BIGINT) + s9 AS pr9
      |  FROM deg d JOIN s2 ON d.src = s2.dst CROSS JOIN nv)
      |SELECT node AS token, deg, CAST(pr9 AS DOUBLE) / 1e9 AS textrank
      |FROM p2
      |ORDER BY pr9 DESC, token
      |LIMIT 20""".stripMargin

  def pack: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q322_textrank_keywords", q322 _, Some(q322Sql)),
    ("q335_sparse_cosine_join", q335 _, Some(q335Sql)),
    ("q243_good_turing", q243 _, Some(q243Sql)),
    ("q256_heaps_law", q256 _, Some(q256Sql)),
    ("q259_zipf_fit", q259 _, Some(q259Sql)),
    ("q272_yule_k", q272 _, Some(q272Sql)),
    ("q244_feature_hashing", q244 _, Some(q244Sql)),
    ("q240_edit_distance_join", q240 _, Some(q240Sql)),
    ("q233_negative_sampling", q233 _, Some(q233Sql)),
    ("q275_bpe_train", q275 _, Some(q275Sql)),
    ("q278_kneser_ney", q278 _, Some(q278Sql)),
    ("q280_oov_rate", q280 _, Some(q280Sql)),
    ("q290_loso_valuation", q290 _, Some(q290Sql)),
    ("q294_truncation_loss", q294 _, Some(q294Sql)),
    ("q296_rag_chunking", q296 _, Some(q296Sql)),
    ("q306_scaling_curve", q306 _, Some(q306Sql)),
    ("q307_effective_size", q307 _, Some(q307Sql)),
    ("q297_index_delete", q297 _, Some(q297Sql)),
    ("q35_decontaminate", q35 _, Some(q35Sql)),
    ("q36_repetition", q36 _, Some(q36Sql)),
    ("q37_pii_redact", q37 _, Some(q37Sql)),
    ("q38_vocab_stats", q38 _, Some(q38Sql)),
    ("q39_unigram_surprisal", q39 _, Some(q39Sql)),
    ("q40_token_stats", q40 _, Some(q40Sql)),
    ("q41_quality_score", q41 _, Some(q41Sql)),
    ("q42_lang_id", q42 _, Some(q42Sql)),
    ("q43_dedup_exact", q43 _, Some(q43Sql)),
    ("q44_bigram_freq", q44 _, Some(q44Sql)),
    ("q175_word2phrase", q175 _, Some(q175Sql)),
    ("q198_bigram_nll", q198 _, Some(q198Sql)),
    ("q205_cluster_canonicalize", q205 _, Some(q205Sql)),
    ("q206_mix_allocation", q206 _, Some(q206Sql)),
    ("q214_index_stats", q214 _, Some(q214Sql)),
    ("q216_split_leakage", q216 _, Some(q216Sql)),
    ("q217_ks_drift", q217 _, Some(q217Sql)),
    ("q179_facet_mi", q179 _, Some(q179Sql)),
    ("q186_langid_eval", q186 _, Some(q186Sql)),
    ("q187_source_dup_rate", q187 _, Some(q187Sql)),
    ("q189_index_append", q189 _, Some(q189Sql)),
    ("q45_neardup_minhash", q45 _, Some(q45Sql)),
    ("q46_neardup_simhash", q46 _, Some(q46Sql)),
    ("q47_winnowing", q47 _, Some(q47Sql)),
    ("q48_duplicate_spans", q48 _, Some(q48Sql)),
    ("q59_url_domains", q59 _, Some(q59Sql)),
    ("q79_tfidf", q79 _, Some(q79Sql)),
    ("q82_dedup_clusters", q82 _, Some(q82Sql)),
    ("q83_ngram_jaccard", q83 _, Some(q83Sql)),
    ("q84_bpe_tokens", q84 _, Some(q84Sql)),
    ("q88_sequence_packing", q88 _, Some(q88Sql)),
    ("q89_stratified_split", q89 _, Some(q89Sql)),
    ("q90_heavy_hitters", q90 _, Some(q90Sql)),
    ("q91_weighted_sample", q91 _, Some(q91Sql)),
    ("q93_global_shuffle", q93 _, Some(q93Sql)),
    ("q94_curation_funnel", q94 _, Some(q94Sql)),
    ("q96_data_mix", q96 _, Some(q96Sql)),
    ("q103_domain_cap", q103 _, Some(q103Sql)),
    ("q104_chunk_overlap", q104 _, Some(q104Sql)),
    ("q105_outlier_mad", q105 _, Some(q105Sql)),
    ("q106_source_jsd", q106 _, Some(q106Sql)),
    ("q108_incremental_dedup", q108 _, Some(q108Sql)),
    ("q109_source_overlap", q109 _, Some(q109Sql)),
    ("q111_token_entropy", q111 _, Some(q111Sql)),
    ("q112_stratum_sample", q112 _, Some(q112Sql)),
    ("q113_containment_join", q113 _, Some(q113Sql)),
    ("q117_length_gini", q117 _, Some(q117Sql)),
    ("q119_gopher_repetition", q119 _, Some(q119Sql)),
    ("q120_bm25_search", q120 _, Some(q120Sql)),
    ("q123_gopher_dup_lines", q123 _, Some(q123Sql)),
    ("q124_boilerplate_lines", q124 _, Some(q124Sql)),
    ("q125_dsir_importance", q125 _, Some(q125Sql)),
    ("q126_ccnet_buckets", q126 _, Some(q126Sql)),
    ("q128_dsir_resample", q128 _, Some(q128Sql)),
    ("q131_bpe_pairs", q131 _, Some(q131Sql)),
    ("q132_vocab_coverage", q132 _, Some(q132Sql)),
    ("q133_span_removal", q133 _, Some(q133Sql)),
    ("q134_stream_neardup", q134 _, Some(q45Sql)),
    ("q139_nb_quality_classifier", q139 _, Some(q139Sql)),
    ("q140_temperature_mix", q140 _, Some(q140Sql)),
    ("q151_edit_distance_join", q151 _, Some(q151Sql)),
    ("q152_phrase_search", q152 _, Some(q152Sql)),
    ("q161_indexed_phrase", q161 _, Some(q152Sql)),
    ("q162_bpe_encode", q162 _, Some(q162Sql)))
}
