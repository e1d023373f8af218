package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Join family. The reference exercises no JOINs of its own (SURVEY.md §2.3)
  * but inherits them from Trino; here they come from Catalyst, with explicit
  * scale hygiene:
  *
  *   - dimension tables (region/nation/supplier/part at TPC-H ratios) are
  *     `broadcast()`-hinted — at 100 TB the fact tables shuffle but the dims
  *     never do;
  *   - fact⋈fact joins (orders⋈lineitem) shuffle on the join key and lean on
  *     AQE for skew handling;
  *   - semi/anti semantics use left_semi/left_anti (no row multiplication,
  *     no post-join dedup).
  */
object Joins {

  /** Inner join + aggregate: customers per nation (broadcast dim). */
  def joinInnerAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(14,2)")).cast("double").as("total_bal"))
      .orderBy(col("n_name"))

  /** Left outer join preserving customers with no orders (count = 0). */
  def joinLeftCount(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  /** Left-semi: customers having at least one order (EXISTS). */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-anti: customers with no orders (NOT EXISTS). */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** TPC-H Q3-style: revenue of BUILDING-segment orders, top 10.
    * Shape: broadcast-able filter side, shuffled fact⋈fact join, partial agg
    * before the final top-k (TakeOrderedAndProject — no global sort).
    */
  def q3Shipping(s: SparkSession, d: String): DataFrame = {
    val cutoff = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Tables.lineitemPar(s, d)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(14,4)")).as("disc_price"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(col("disc_price")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue per ASIA nation via a 5-way join; dims
    * broadcast, facts shuffle once each.
    */
  def q5LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(14,4)")).as("disc_price"))
    val supp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))

    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("disc_price")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q1-style pricing summary: the canonical wide-aggregate scan. */
  def q1Pricing(s: SparkSession, d: String): DataFrame = {
    val cutoff = java.sql.Timestamp.valueOf("1998-09-01 00:00:00")
    Tables.lineitemPar(s, d)
      .filter(col("l_shipdate") <= cutoff)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(14,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double").as("sum_base"),
        // string-bridged: the scale-6 sum's unscaled value passes 2^53 at
        // sf0.1, where DuckDB's direct decimal→double cast double-rounds
        // (int128→double, then ÷10^6) and can sit one ulp off Spark's
        // BigDecimal.doubleValue(); decimal→string→double is exact then
        // correctly rounded in both engines
        sum(col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(14,4)"))
          .cast("string").cast("double").as("sum_disc_price"),
        // exact-sum / count division in double: reduction-order independent
        (sum(col("l_quantity").cast("decimal(14,2)")).cast("double") /
          count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** In-subquery: lineitems whose part has the max size bucket. */
  def inSubquery(s: SparkSession, d: String): DataFrame = {
    val bigParts = Tables.part(s, d)
      .filter(col("p_size") >= 50)
      .select(col("p_partkey"))
    Tables.lineitem(s, d)
      .join(broadcast(bigParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy()
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(14,2)")).cast("double").as("qty"))
  }

  /** TPC-H Q6-style forecast-revenue: tight filter + global exact sum — the
    * canonical predicate-pushdown showcase (filters reach the parquet
    * reader; only 3 columns read).
    */
  def q6Forecast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= java.sql.Timestamp.valueOf("1996-01-01 00:00:00") &&
        col("l_shipdate") < java.sql.Timestamp.valueOf("1997-01-01 00:00:00") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast("decimal(14,2)") *
        col("l_discount").cast("decimal(14,4)")).cast("double").as("revenue"))

  /** TPC-H Q4-style: order counts by priority where a lineitem shipped
    * after the order date (EXISTS via left-semi; no row multiplication).
    */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= java.sql.Timestamp.valueOf("1996-01-01 00:00:00") &&
        col("o_orderdate") < java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
    val late = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(late,
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q7-style: shipping volume between two nations by year. Dims
    * broadcast; one shuffle per fact join; year extraction after the join
    * keeps the scan pruned.
    */
  def q7Volume(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        (col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(14,4)")).as("volume"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("supp_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("cust_nk"))
      .filter(col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("yr"))
      .agg(sum(col("volume")).cast("double").as("volume"))
      .orderBy(col("yr"))
  }

  /** Correlated scalar subquery, decorrelated the Spark-idiomatic way:
    * "orders at the minimum price of their priority" = groupBy-min +
    * equi-join back (Catalyst performs the same decorrelation for the SQL
    * form; expressing it directly keeps the plan explicit).
    */
  def correlatedMin(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val mins = ord.groupBy(col("o_orderpriority").as("p"))
      .agg(min(col("o_totalprice")).as("min_price"))
    ord.join(broadcast(mins),
        col("o_orderpriority") === col("p") && col("o_totalprice") === col("min_price"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Date arithmetic: ship-lag distribution (datediff in whole days,
    * bucketed). Exact integer day diffs on both engines.
    */
  def shipLagDays(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).as("lag_days"))
      // non-negative guard so `div` (trunc) and `//` (floor) agree
      .filter(col("lag_days") >= 0)
      .groupBy(expr("lag_days div 30").cast("int").as("lag_month"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lag_month"))

  /** Scalar subquery with exact arithmetic: orders above 90% of the max. */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val threshold = ord.agg(max(col("o_totalprice")).as("mx"))
    ord.crossJoin(broadcast(threshold))
      .filter(col("o_totalprice") > col("mx") * 0.9)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** TPC-H Q18 (large-volume customer): orders whose total quantity
    * exceeds the threshold, joined back to orders + customer, top 100 by
    * price. The HAVING subquery is one map-side-combined aggregation on
    * l_orderkey; both joins then shuffle on orderkey/custkey once — the
    * canonical "aggregate, then enrich" shape that scales linearly.
    */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitemPar(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(14,2)")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    Tables.orders(s, d).join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting), adapted to the
    * available columns (no commit/receipt dates in the synthetic
    * lineitem): per multi-supplier order, the UNIQUE latest-shipping
    * supplier is the one everyone waited on; count such orders per
    * supplier. The exists/not-exists double correlation of the original
    * becomes one (orderkey, suppkey) aggregation plus per-order window
    * marks — no self-joins of lineitem at all, which is the plan you want
    * when lineitem is the 100 TB fact.
    */
  def q21WaitingSupplier(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSupp = Tables.lineitemPar(s, d)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("supp_max"))
    val w = Window.partitionBy(col("l_orderkey"))
    val culprits = perSupp
      .withColumn("order_max", max(col("supp_max")).over(w))
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_at_max",
        sum(when(col("supp_max") === col("order_max"), 1).otherwise(0)).over(w))
      .filter(col("n_supp") >= 2 && col("n_at_max") === 1 &&
        col("supp_max") === col("order_max"))
    culprits.join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q10-style returned-items report: revenue lost to returns per
    * customer (top 20). Facts join and shuffle on the order key once;
    * customer and nation broadcast; top-k via limit (TakeOrdered).
    */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitemPar(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(14,4)")).as("disc_price"))
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(col("disc_price")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14-style promo revenue share over one shipping year: both the
    * conditional and total revenue come from ONE decimal aggregation pass
    * (no second scan), then a single double division — the two-sums-one-
    * divide spelling both engines reproduce exactly.
    */
  def q14PromoShare(s: SparkSession, d: String): DataFrame = {
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_type"),
        (col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(14,4)")).as("disc_price"))
      .agg(
        // string-bridged decimal→double (see q1Pricing): these year-wide
        // scale-6 sums ride the 2^53 unscaled boundary at sf0.1
        (lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("disc_price"))
            .otherwise(lit(0).cast("decimal(18,6)"))).cast("string").cast("double") /
          sum(col("disc_price")).cast("string").cast("double")).as("promo_share"))
  }

  /** TPC-H Q19-style disjunctive predicate revenue: three brand/size/
    * quantity bands OR-ed together — the shape that exercises complex
    * predicate pushdown and guards against a planner multiplying the
    * disjunction into a cross join. Part is broadcast; one scan each.
    */
  def q19BandedRevenue(s: SparkSession, d: String): DataFrame = {
    val bands = (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#13" && col("p_size").between(1, 20) &&
        col("l_quantity").between(10, 25)) ||
      (col("p_brand") === "Brand#20" && col("p_size").between(1, 30) &&
        col("l_quantity").between(20, 35))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(14,4)")).as("disc_price"))
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(bands)
      .agg(sum(col("disc_price")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Skew-safe join demo over [[Skew.saltedJoin]]: per-segment order
    * counts through the salted (key, salt) join — semantically identical
    * to the plain equi-join the oracle spells, which is exactly the
    * property the salting contract promises.
    */
  def saltedJoinDemo(s: SparkSession, d: String): DataFrame = {
    val left = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey").as("custkey"))
    val right = Tables.customer(s, d)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    Skew.saltedJoin(left, right, "custkey", 8)
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("seg"))
  }

  /** Root of the bucketed-table demo warehouse (wiped per run). */
  private[graft] val bucketedDemoPath = "/tmp/graft-bucketed-demo"

  /** Builds the two bucketed tables the demo joins: orders and lineitem
    * both bucketed (and sorted) 8 ways on the order key, so a sort-merge
    * join between them needs NO Exchange on either side — the co-located
    * fact-to-fact join layout that at 100 TB replaces the two largest
    * shuffles of the plan with bucket-local merges. Session-catalog
    * external tables; files land under [[bucketedDemoPath]].
    */
  private[graft] def bucketedTables(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // layout keyed by SF so sf0.01 and sf0.1 runs never read each other's
    // buckets; a marker written only after BOTH writes succeed makes the
    // across-session reuse crash-safe
    val root = s"$bucketedDemoPath/${new java.io.File(d).getName}"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$root/_graft_built")
    s.sql("DROP TABLE IF EXISTS graft_bkt_orders")
    s.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    if (!fs.exists(marker)) {
      if (fs.exists(rootPath)) fs.delete(rootPath, true)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$root/orders")
        .saveAsTable("graft_bkt_orders")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$root/lineitem")
        .saveAsTable("graft_bkt_lineitem")
      fs.create(marker).close()
    } else {
      // the data files carry the bucket layout in their names; a build in
      // a LATER session only has to re-declare the external tables —
      // bucketing metadata is declarative over immutable files, the same
      // reason a 100 TB table is bucketed once and joined forever
      s.sql(s"""CREATE TABLE graft_bkt_orders (o_orderkey BIGINT, o_orderstatus STRING)
               |USING parquet CLUSTERED BY (o_orderkey) SORTED BY (o_orderkey) INTO 8 BUCKETS
               |LOCATION '$root/orders'""".stripMargin)
      s.sql(s"""CREATE TABLE graft_bkt_lineitem (l_orderkey BIGINT, l_extendedprice DOUBLE)
               |USING parquet CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey) INTO 8 BUCKETS
               |LOCATION '$root/lineitem'""".stripMargin)
    }
    (s.table("graft_bkt_orders"), s.table("graft_bkt_lineitem"))
  }

  /** Bucketed co-located join end-to-end: revenue-by-status through a
    * sort-merge join of the two bucketed tables (`merge` hint pins SMJ so
    * the demo exercises the bucket layout rather than a broadcast that the
    * small local SF would otherwise pick). The only Exchange left in the
    * whole plan is the final tiny aggregation — PlanShapeSpec asserts
    * exactly that. Results are oracle-checked against the plain join.
    */
  def bucketedJoinDemo(s: SparkSession, d: String): DataFrame = {
    val (o, l) = bucketedTables(s, d)
    o.hint("merge").join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double").as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  /** DuckDB oracle for [[bucketedJoinDemo]] — the equivalent plain join;
    * bucketing must never change answers, only the plan.
    */
  val bucketedJoinDemoSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
}
