package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's relational operator surface (SURVEY.md §2.2/2.4/2.5),
  * re-expressed as declarative DataFrame plans so Catalyst owns pushdown,
  * pruning, partial aggregation and join strategy.
  *
  * Numeric-exactness stance (SURVEY.md §7.6-1): any aggregate over a double
  * column first casts to decimal so the result is independent of partition
  * order / reduction order — mandatory for bit-exact parity with a
  * single-threaded oracle, and the same trick the reference relies on for
  * its decimal contract (reference tests/IntegrationTests/QueryScalarTests
  * .cs:109-115 asserts sum(decimal) exactly 351.00). The FINAL output is
  * cast decimal→double (correctly rounded on both engines): decimal scale
  * with trailing zeros ("1524135.00") round-trips differently through the
  * harness's pandas compare than a float ("1524135.0"), so decimal never
  * appears in a result schema.
  */
object Relational {

  /** Exact, order-insensitive sum of a double column: cast to decimal first. */
  private def dsum(c: Column, cast: String = "decimal(14,2)"): Column =
    sum(c.cast(cast))

  // ---- Scans & projections (S1, P1-P4) ----

  def scanStarRegion(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).orderBy(col("r_regionkey"))

  def projCols(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  def projAliasLit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey").as("id"),
        lit(1).as("one"),
        lit("x").as("tag"),
        lit(true).as("flag"))
      .orderBy(col("id"))

  // ---- Filters (P5-P10) ----

  def filterEqInt(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .orderBy(col("l_orderkey"))

  def filterStrRange(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 0.0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  def filterTs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
      .select(col("event_id"), col("event_type"), col("user_id"))
      .orderBy(col("event_id"))

  def emptyResult(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") > 900000000000L)
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  def nullPropagation(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        when(col("lang") === "en", lit(null)).otherwise(col("lang")).as("lang_or_null"))
      .orderBy(col("doc_id"))

  // ---- Aggregations (A1-A5) ----

  def aggCountGlobal(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  def aggSumGlobal(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(dsum(col("l_quantity")).cast("double").as("sum_qty"))

  def aggAvgCast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(avg(col("l_linenumber").cast("double")).as("avg_line"))

  def aggMinMax(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .agg(
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"),
        min(col("p_name")).as("min_name"),
        max(col("p_name")).as("max_name"))

  /** Flagship: the category aggregate, the reference's most-asserted query
    * (reference tests/IntegrationTests/TrinoClientIntegrationTests.cs:87-95).
    */
  def aggGroupOrder(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        dsum(col("o_totalprice")).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  // ---- Sort / limit / distinct (O1+) ----

  def orderbyDescLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  def distinctPairs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))
}
