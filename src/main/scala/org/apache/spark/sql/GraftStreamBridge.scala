package org.apache.spark.sql

import org.apache.spark.sql.types.StructType

/** The one classic-session internal a V1 streaming [[org.apache.spark.sql
  * .execution.streaming.Source]] needs: `getBatch` must hand the engine a
  * DataFrame whose logical plan is flagged `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only constructor for such a
  * plan from an arbitrary computed RDD is `SparkSession
  * .internalCreateDataFrame(rdd, schema, isStreaming = true)` — exactly how
  * Spark's own FileStreamSource (and Delta Lake's DeltaSource) build their
  * batch DataFrames. Lives in `org.apache.spark.sql` for the `private[sql]`
  * access, the same extension-point pattern as [[GraftScanBridge]] /
  * [[GraftSqlBridge]].
  */
object GraftStreamBridge {

  /** Re-plan `df` (a normal batch DataFrame) as a streaming micro-batch
    * DataFrame with exactly `schema`. The physical work stays lazy: this
    * only wraps the batch plan's RDD in a streaming-flagged LogicalRDD —
    * no job runs until the sink consumes the batch.
    */
  def asStreamingBatch(spark: SparkSession, df: DataFrame,
                       schema: StructType): DataFrame = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val classicDf = df.asInstanceOf[classic.Dataset[Row]]
    classicSpark.internalCreateDataFrame(
      classicDf.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** The inverse, for a V1 [[org.apache.spark.sql.execution.streaming
    * .Sink]]: the micro-batch DataFrame `addBatch` receives is
    * streaming-flagged, so batch writers (`df.write`) refuse it — re-plan
    * it as a plain batch over the same RDD, exactly what foreachBatch
    * does for its callers.
    */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val classicDf = df.asInstanceOf[classic.Dataset[Row]]
    classicSpark.internalCreateDataFrame(
      classicDf.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
