package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset factory so the engine can hand a
  * custom [[LogicalPlan]] (e.g. `graft.plans.AsOfJoinNode`) back to the
  * public DataFrame API. Placing a tiny accessor object inside
  * `org.apache.spark.sql` is the established pattern for libraries that
  * contribute whole logical operators (see SNIPPETS.md [2]/[3] — Pathling's
  * `ColumnDataset.ofColumns` and Qbeast's `DatasetFactory.create` do exactly
  * this); everything else in this repo stays in the `graft` namespace.
  */
object GraftSqlApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
