package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-pattern matching over ordered per-key streams — the reusable
  * MATCH_RECOGNIZE-shaped operator the funnel queries (q98/q305) used to
  * hand-roll per query.
  *
  * Two pattern families, each compiled to a fixed number of passes:
  *
  *  - [[funnel]] / [[stepTimes]]: an ORDERED STEP SEQUENCE (each step's
  *    first qualifying occurrence must be at/after — optionally within a
  *    deadline of — the previous step's), compiled to the chained
  *    conditional-MIN cascade: per step one key-grouped MIN plus one join
  *    against the previous step's cohort. The cohort tables are ≤ one
  *    row per key, so AQE broadcasts every chaining join; cost = one
  *    key shuffle per step, invariant in pattern complexity per row.
  *
  *  - [[firstContiguousMatch]]: a STRICT-CONTIGUITY `A B* C` pattern
  *    (start row, any number of filler rows, end row — no other row may
  *    intervene) with per-step capture, compiled to ONE window pass: the
  *    earliest FOLLOWING non-filler row is a struct-ordered MIN over an
  *    unbounded-following frame (rn leads the struct, so lexicographic
  *    MIN is "smallest rn, captures ride along" — the cross-engine-safe
  *    struct-min convention), and an A-row matches iff that row
  *    satisfies the end predicate. No self-join, no per-pattern-length
  *    scan: the whole match, including captures, is two window
  *    functions over one key partitioning.
  *
  * Everything is deterministic: orderings take an explicit tiebreaker,
  * so the "first match per key" is well-defined and an unrolled SQL
  * restatement reproduces it row-for-row.
  */
object SeqPattern {

  /** One step of an ordered sequence pattern.
    * @param name      label carried into funnel output rows
    * @param predicate which rows can serve this step
    * @param within    optional deadline: this step's occurrence must be
    *                  ≤ previous-step time + within (same units as the
    *                  order column) */
  final case class Step(name: String, predicate: Column,
      within: Option[Column] = None)

  /** Per-key first-match time of every step: element k is a DataFrame
    * (key, t) of keys that completed steps 0..k, with t = the earliest
    * step-k occurrence at/after (and within the deadline of) the key's
    * step-(k-1) time. */
  def stepTimes(events: DataFrame, keyCol: String, ordCol: String,
      steps: Seq[Step]): Seq[DataFrame] = {
    require(steps.nonEmpty, "pattern needs at least one step")
    val first = events.filter(steps.head.predicate)
      .groupBy(col(keyCol)).agg(min(col(ordCol)).as("t"))
    steps.tail.foldLeft(List(first)) { (acc, st) =>
      val prev = acc.head.select(col(keyCol), col("t").as("graft_prev"))
      val deadline = st.within
        .map(w => col(ordCol) <= col("graft_prev") + w)
        .getOrElse(lit(true))
      val next = events.filter(st.predicate)
        .join(prev, keyCol)
        .filter(col(ordCol) >= col("graft_prev") && deadline)
        .groupBy(col(keyCol)).agg(min(col(ordCol)).as("t"))
      next :: acc
    }.reverse
  }

  /** The funnel summary q98/q305 report: one row per step, (n_users,
    * step), in pattern order. */
  def funnel(events: DataFrame, keyCol: String, ordCol: String,
      steps: Seq[Step]): DataFrame =
    stepTimes(events, keyCol, ordCol, steps).zip(steps).map {
      case (cohort, st) =>
        cohort.agg(count(lit(1)).as("n_users"))
          .withColumn("step", lit(st.name))
    }.reduce(_ unionByName _)

  /** First strict-contiguity `A B* C` match per key, one row per match.
    *
    * Within each key's (ord, tie)-ordered stream: a match starts at a
    * row satisfying `aPred`, spans zero or more contiguous rows
    * satisfying `bPred`, and ends at the next non-`bPred` row — which
    * must satisfy `cPred` (any other interloper kills that start). Of a
    * key's matching starts, only the EARLIEST is returned.
    *
    * @param captures (name, expr) columns evaluated on the END row and
    *                 returned alongside the match. Keep them on integer/
    *                 exact grids — they ride inside the struct-min.
    * @return (key, a_ord, c_ord, n_mid, captures*) */
  def firstContiguousMatch(events: DataFrame, keyCol: String, ordCol: String,
      tieCol: String, aPred: Column, bPred: Column, cPred: Column,
      captures: Seq[(String, Column)]): DataFrame =
    contiguousMatches(events, keyCol, ordCol, tieCol, aPred, bPred, cPred,
      captures, firstOnly = true)
      .drop("match_no")

  /** Every strict-contiguity `A B* C` match per key (the AFTER MATCH SKIP
    * TO NEXT ROW semantics — matches cannot overlap here, because a
    * second start row inside a span would itself be the span's first
    * non-filler row and kill it), numbered 1.. per key in stream order.
    * Same one-pass compilation as [[firstContiguousMatch]]; `firstOnly`
    * keeps only each key's earliest match.
    * @return (key, match_no, a_ord, c_ord, n_mid, captures*) */
  def contiguousMatches(events: DataFrame, keyCol: String, ordCol: String,
      tieCol: String, aPred: Column, bPred: Column, cPred: Column,
      captures: Seq[(String, Column)], firstOnly: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol), col(tieCol))
    val follow = w.rowsBetween(1, Window.unboundedFollowing)
    // the earliest following non-filler row, captures riding in the
    // struct behind the leading rn (unique within the key, so the
    // lexicographic MIN never reads past it)
    val nxtStruct = min(when(!bPred, struct(
      col("graft_rn").as("rn"),
      cPred.cast("int").as("is_c"),
      col(ordCol).cast("long").as("c_ord"),
      struct(captures.map { case (n, c) => c.as(n) }: _*).as("cap")))
    ).over(follow)
    val matches = events
      .withColumn("graft_rn", row_number().over(w))
      .withColumn("graft_nxt", nxtStruct)
      .filter(aPred && col("graft_nxt").isNotNull
        && col("graft_nxt.is_c") === 1)
    val firstPerKey = Window.partitionBy(col(keyCol))
      .orderBy(col("graft_rn"))
    matches
      .withColumn("graft_mrn", row_number().over(firstPerKey))
      .filter(if (firstOnly) col("graft_mrn") === 1 else lit(true))
      .select(Seq(col(keyCol), col("graft_mrn").as("match_no"),
        col(ordCol).cast("long").as("a_ord"),
        col("graft_nxt.c_ord").as("c_ord"),
        (col("graft_nxt.rn") - col("graft_rn") - 1).as("n_mid")) ++
        captures.map { case (n, _) => col(s"graft_nxt.cap.$n").as(n) }: _*)
  }
}
