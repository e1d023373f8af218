package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-expression, set-operation and grouping-analytics surface
  * (SURVEY.md §2.6 extensions). Everything stays inside whole-stage codegen
  * — built-in functions only, no UDFs.
  */
object Expressions {

  /** CASE WHEN bucketing + cast + group (P4/A5 composition). */
  def exprCaseCast(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("bucket",
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 200000, "medium")
          .otherwise("large"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice").cast("decimal(14,2)")).cast("decimal(18,2)").as("min_price"),
        max(col("o_totalprice").cast("decimal(14,2)")).cast("decimal(18,2)").as("max_price"))
      .orderBy(col("bucket"))

  /** String functions: upper/length/substring/concat/like. */
  def exprStringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").like("%gre%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  /** Temporal extraction: year/month/quarter from the order timestamp. */
  def exprDateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        quarter(col("o_orderdate")).as("qtr"))
      .groupBy(col("yr"), col("qtr"), col("mo"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("yr"), col("qtr"), col("mo"))

  /** Integer arithmetic incl. modulo (hash-bucket shape). */
  def exprArithMod(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("bucket", (col("l_orderkey") % 7).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** HAVING: priorities with above-threshold order counts. */
  def exprHaving(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 100)
      .orderBy(col("o_orderpriority"))

  // ---- set operations ----

  /** UNION (distinct): nation keys present among customers or suppliers. */
  def setUnion(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      .union(Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
      .distinct()
      .orderBy(col("nationkey"))

  /** INTERSECT: nation keys with both customers and suppliers. */
  def setIntersect(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
      .orderBy(col("nationkey"))

  /** EXCEPT: customer nations with no supplier. */
  def setExcept(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      .except(Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
      .orderBy(col("nationkey"))

  // ---- grouping analytics ----

  /** ROLLUP with normalized (COALESCE'd) grouping keys so NULL-ordering
    * differences between engines can't affect the comparison.
    */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(14,2)")).cast("decimal(18,2)").as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))

  /** CUBE over two dimensions, same normalization. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"))
      .orderBy(col("status"), col("priority"))
}
