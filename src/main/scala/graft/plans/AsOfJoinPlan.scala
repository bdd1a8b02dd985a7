package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlApi}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.col

/** Whole-operator as-of join: logical node + planner strategy + physical
  * sort-merge operator, registered through [[GraftExtensions]].
  *
  * This is the (c)-tier custom-operator path — a genuine `SparkPlan` — for
  * the semantics [[graft.operators.AsOfJoin]] expresses compositionally
  * (union + event-time window). The reference's warehouse is keyed
  * (entity, event-time) (/root/reference/dags/crypto-etl-pipeline-psql.py:157-164),
  * making "latest right row at-or-before each left row" its natural lookup.
  *
  * Scale shape vs the composed form: each side shuffles ONCE on its own
  * equality keys and sorts by (keys, ts) — Catalyst's EnsureRequirements
  * inserts the exchanges/sorts from the declared child requirements, so AQE
  * still re-plans them — then a single forward-only merge pass per partition
  * emits every left row with the latest right row whose ts <= left ts.
  * The composed window form must union BOTH sides through one exchange and
  * sort the combined stream; here the (usually much smaller) right side
  * sorts separately, and neither side's rows are widened with the other's
  * null-padded columns before the shuffle.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {
  // Left-outer semantics: unmatched left rows keep null right columns.
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are required hash-clustered on their
  * equality keys and sorted by (keys, ts); the merge is a single
  * forward-only pass per partition — no per-row binary search, no range
  * explosion, right rows buffered one at a time (O(1) state beyond the
  * current match). Key comparison uses null-safe natural ordering, so null
  * keys group and match like values (callers filter nulls for SQL-join
  * semantics). Ties (right.ts == left.ts) match, and among equal-ts right
  * rows the last in sort order wins — identical to the composed window
  * form's `last(...) ignoreNulls` semantics.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val lRdd = left.execute()
    val rRdd = right.execute()
    // The per-partition merge assumes partition i of each side holds the
    // same key hash range. EnsureRequirements co-partitions the two
    // ClusteredDistribution children today, but nothing in the SparkPlan
    // contract forbids a future planner/AQE change (e.g. one-sided
    // coalescing) from breaking that silently — zipPartitions would then
    // pair MISALIGNED partitions and emit wrong (not fewer) rows. Fail
    // loudly instead; zipPartitions' own error only fires on unequal
    // COUNTS, and this message says what actually went wrong.
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec children are not co-partitioned: left has " +
        s"${lRdd.getNumPartitions} partitions, right has " +
        s"${rRdd.getNumPartitions}. The planner must shuffle both sides " +
        "to the same partitioning before this operator runs.")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsExpr.dataType))
      // Bind the result projection positionally with nullable=true inputs:
      // the null-padded GenericInternalRow on the unmatched path must go
      // through isNullAt checks even though right attrs are non-nullable.
      val resultProj = UnsafeProjection.create(
        output, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // Current right head (rows from the sorter are reused — key/ts
        // projections are re-derived on advance; retained matches copy).
        private var rRow: InternalRow = _
        private var rHas = false
        // Latest right row consumed for the current key run, plus its key
        // (the match may be stale once the left key advances past it).
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) { rRow = rIter.next(); rHas = true } else { rHas = false }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTs = lTsProj(lRow)
          // Drop right runs for keys before the current left key.
          while (rHas && keyOrd.compare(rKeyProj(rRow), lKey) < 0) advanceRight()
          // Consume the at-or-before prefix of the current key's right run;
          // the last row consumed is the match (equal-ts rows: last wins).
          while (rHas && keyOrd.compare(rKeyProj(rRow), lKey) == 0 &&
              tsOrd.compare(rTsProj(rRow), lTs) <= 0) {
            lastMatch = rRow.copy()
            lastMatchKey = rKeyProj(rRow).copy()
            advanceRight()
          }
          numOutputRows += 1
          val matched = lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0
          if (matched) { numMatched += 1; resultProj(joined(lRow, lastMatch)) }
          else resultProj(joined(lRow, nullRight))
        }
      }
    }
  }
}

/** Public API over [[AsOfJoinNode]]. */
object NativeAsOf {
  /** As-of join `left` to `right` on equality `keys` with
    * `right(rightTs) <= left(leftTs)`, latest match wins, left-outer.
    * Right columns whose names collide with a left column are attached with
    * an `_r` suffix; every right column is re-aliased (fresh exprIds), so
    * self-joins — both sides reading the same source — stay unambiguous.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    // Rename targets must be unique against BOTH the left side's columns
    // and each other (left may already carry a `<c>_r`; keep suffixing
    // until free). A plain one-shot `c + "_r"` check missed the
    // left-collision case and produced ambiguous duplicate output names.
    val used = scala.collection.mutable.Set[String](left.columns: _*)
    val rName = right.columns.map { c =>
      var n = c
      while (used.contains(n)) n += "_r"
      used += n
      c -> n
    }.toMap
    val rFresh = right.select(right.columns.map(c => col(c).as(rName(c))): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rFresh.queryExecution.analyzed
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val node = AsOfJoinNode(lPlan, rPlan,
      keys.map(resolve(lPlan, _)),
      keys.map(k => resolve(rPlan, rName(k))),
      resolve(lPlan, leftTs), resolve(rPlan, rName(rightTs)))
    GraftSqlApi.ofRows(left.sparkSession, node)
  }
}
