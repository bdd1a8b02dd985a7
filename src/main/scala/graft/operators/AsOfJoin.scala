package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with the same key and right.ts <= left.ts — the natural lookup of this
  * engine's time-series domain ("price as of time T"; the reference's
  * warehouse is keyed (entity, event-time),
  * /root/reference/dags/crypto-etl-pipeline-psql.py:157-164).
  *
  * Implementation is the union + event-time window scan, not a range join:
  * both sides shuffle ONCE on the key, then a single ordered pass per key
  * carries the latest right payload forward (last ignoreNulls). No range
  * explosion, no per-row binary search, and at 100 TB it inherits the
  * partitioning a (key, time)-bucketed lake already has. Right rows sort
  * before left rows at equal timestamps, so "at or before" includes ties.
  */
object AsOfJoin {

  /** @param keys       equality keys present on both sides
    * @param leftTs     left event-time column (orderable type)
    * @param rightTs    right event-time column (same type)
    * @param payload    right columns to attach to each left row
    * @param tolerance  optional max staleness (same units as the ts
    *                   columns' numeric type); matches older than this are
    *                   nulled out
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__asof_side"), "reserved column name")

    val l = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_rts", lit(null).cast(right.schema(rightTs).dataType))
    val lAligned = payload.foldLeft(l)((df, p) =>
      df.withColumn(s"__p_$p", lit(null).cast(right.schema(p).dataType)))

    val rBase = right
      .withColumn("__asof_ts", col(rightTs))
      .withColumn("__asof_side", lit(0))
      .withColumn("__asof_rts", col(rightTs))
    val rAligned = payload.foldLeft(rBase)((df, p) =>
      df.withColumn(s"__p_$p", col(p)))
      .select((keys ++ Seq("__asof_ts", "__asof_side", "__asof_rts") ++
        payload.map(p => s"__p_$p")).map(col): _*)

    val lSel = lAligned.select((leftCols ++ Seq("__asof_ts", "__asof_side", "__asof_rts") ++
      payload.map(p => s"__p_$p")).map(col): _*)

    val unioned = lSel.unionByName(rAligned, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, 0)

    // Carry ONE struct of (match ts + all payload fields) per right row.
    // The struct itself is never null for a right row even when payload
    // fields are, so null payload values are preserved — and every output
    // column unpacks from the SAME matched right row (per-column carries
    // could mix fields from different right rows when some are null).
    val matchStruct = struct(
      (col("__asof_rts").as("__rts") +:
        payload.map(p => col(s"__p_$p").as(s"__p_$p"))): _*)
    val carried = unioned.withColumn("__asof_match",
      last(when(col("__asof_side") === 0, matchStruct), ignoreNulls = true).over(w))

    val withinTol = tolerance match {
      case Some(tol) => col("__asof_ts") - col("__asof_match.__rts") <= tol
      case None => col("__asof_match").isNotNull
    }

    val result = payload.foldLeft(carried.filter(col("__asof_side") === 1)) {
      (df, p) => df.withColumn(p, when(withinTol, col(s"__asof_match.__p_$p")))
    }.withColumn(s"matched_$rightTs", when(withinTol, col("__asof_match.__rts")))

    result.select((leftCols ++ payload ++ Seq(s"matched_$rightTs")).map(col): _*)
  }
}
