package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Shared plan-inspection helpers for specs. */
object TestPlans {
  /** Number of distinct partition directories the query's file scan would
    * actually list after planning-time partition pruning (-1 when the leaf
    * is not a file scan). */
  def prunedPartitionCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().head match {
      case f: FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .map(_.values.toString).distinct.length
      case _ => -1
    }
}
