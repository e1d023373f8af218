package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal plan↔Dataset shims for the incremental-MV plan surgery
  * ([[graft.MvIncremental.replayAugmented]]): `Dataset.ofRows` and the
  * analyzed plan accessor are `private[sql]`, so the two one-liners live
  * in this package — the same extension-point pattern as
  * [[GraftScanBridge]].
  */
object GraftPlanBridge {

  /** Execute an arbitrary logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A DataFrame's ANALYZED plan — the stable subtree to graft under an
    * unresolved parent (resolution descends past resolved nodes).
    */
  def planOf(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
