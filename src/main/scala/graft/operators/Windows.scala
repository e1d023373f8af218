package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window functions (SURVEY.md §2.6 extension surface). All windows are
  * keyed (`partitionBy`) so the computation distributes: one shuffle on the
  * partition key, then per-partition sorted evaluation — no global sort, no
  * driver materialization. An unpartitioned window would serialize the whole
  * table through one task and is deliberately absent.
  */
object Windows {

  /** Top-3 orders per customer by price (row_number pattern — the standard
    * distributed top-k-per-group).
    */
  def windowTopkPerKey(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running (cumulative) spend per user over the event stream. Input cast
    * to decimal so the running sum is exact at every prefix.
    */
  def windowRunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.eventsPar(s, d)
      .select(col("user_id"), col("event_id"), col("value").cast("decimal(14,4)").as("v"))
      .withColumn("running_value", sum(col("v")).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** rank + dense_rank over part sizes within a brand. */
  def windowRanks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_size"), col("p_partkey"))
    Tables.part(s, d)
      .select(col("p_brand"), col("p_partkey"), col("p_size"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .orderBy(col("p_brand"), col("rnk"), col("p_partkey"))
  }

  /** lag/lead: inter-event gap in seconds per user (sessionization building
    * block).
    */
  def windowLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.eventsPar(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_sec",
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))).cast("long"))
      .select(col("user_id"), col("event_id"), col("gap_sec"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Moving (3-row) sum per user — a bounded sliding frame. */
  def windowMovingSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value").cast("decimal(14,4)").as("v"))
      .withColumn("moving_value", sum(col("v")).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("moving_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** first_value / last_value over the full partition + ntile quartiles. */
  def windowFirstLastNtile(s: SparkSession, d: String): DataFrame = {
    val full = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ord = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.eventsPar(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("first_type", first(col("event_type")).over(full))
      .withColumn("last_type", last(col("event_type")).over(full))
      .withColumn("quartile", ntile(4).over(ord).cast("long"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Tumbling 5-minute windows over events as epoch buckets — the batch
    * twin of the Structured Streaming windowed aggregation
    * (graft.streaming), expressed so an ANSI oracle can replicate it.
    */
  def windowTumblingEpoch(s: SparkSession, d: String): DataFrame =
    Tables.eventsPar(s, d)
      .withColumn("bucket", expr("(unix_timestamp(ts) div 300) * 300"))
      .groupBy(col("bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,4)")).cast("double").as("total_value"))
      .orderBy(col("bucket"), col("event_type"))
}
