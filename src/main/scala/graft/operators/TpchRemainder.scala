package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The remaining canonical TPC-H shapes (q2, q8, q9, q11-q13, q15-q17,
  * q20, q22), adapted to the synthetic star schema (no partsupp table and
  * no commit/receipt dates — lineitem stands in as the part↔supplier
  * relation where TPC-H uses partsupp, exactly like the q7/q21
  * adaptations). Scale hygiene follows Joins.scala: dims broadcast, facts
  * shuffle once on their join key, aggregates partial map-side, top-k via
  * limit (TakeOrderedAndProject). Decimal discipline: double aggregates go
  * through DECIMAL so results are reduction-order independent, and
  * correlated averages are spelled multiply-through (qty*cnt*5 < sum)
  * instead of divide so both engines compare exact decimals.
  */
object TpchRemainder {

  private def discPrice = (col("l_extendedprice").cast("decimal(14,2)") *
    (lit(1.0) - col("l_discount")).cast("decimal(14,4)")).as("disc_price")

  /** Q2 (min-cost supplier): for each size-15 part, the EUROPE supplier
    * with the lowest observed price. The correlated MIN is a window-min
    * over the (already part-filtered, tiny) candidate set — ONE pass over
    * the lineitem aggregation instead of recomputing it on both sides of
    * a min-join (a self-join here duplicated the 600k-row aggregation
    * subtree; Spark specializes shared subtrees per consumer).
    */
  def q2MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ps = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("cost"))
    val es = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("s_acctbal"), col("s_name"), col("n_name"))
    val cand = ps
      .join(broadcast(Tables.part(s, d).filter(col("p_size") === 15)
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(broadcast(es), col("l_suppkey") === col("s_suppkey"))
    cand
      .withColumn("min_cost", min(col("cost")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q8 (national market share): NATION_3's share of AMERICA-customer
    * import volume per year — one conditional/total sum pair in a single
    * aggregation pass.
    */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    val custNation = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "AMERICA")
      .select(col("c_custkey"))
    val suppNation = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    Tables.lineitemPar(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).cast("int").as("yr"),
        col("supp_nation"), discPrice)
      .groupBy(col("yr"))
      // string-bridged decimal→double (see Joins.q1Pricing): per-year
      // scale-6 volume sums ride the 2^53 unscaled boundary at sf0.1
      .agg((sum(when(col("supp_nation") === "NATION_3", col("disc_price"))
          .otherwise(lit(0).cast("decimal(18,6)"))).cast("string").cast("double") /
        sum(col("disc_price")).cast("string").cast("double")).as("mkt_share"))
      .orderBy(col("yr"))
  }

  /** Q9 (product-type profit): per supplier nation per year over 'red'
    * parts; profit = revenue − 0.5·retailprice·qty (the supplycost term,
    * partsupp-free) in exact decimal.
    */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame = {
    val amount = (col("l_extendedprice").cast("decimal(14,2)") *
      (lit(1.0) - col("l_discount")).cast("decimal(14,4)") -
      lit(0.5).cast("decimal(4,2)") * col("p_retailprice").cast("decimal(14,2)") *
        col("l_quantity").cast("decimal(14,2)")).as("amount")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("nation"), year(col("o_orderdate")).cast("int").as("yr"), amount)
      .groupBy(col("nation"), col("yr"))
      .agg(sum(col("amount")).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("yr").desc)
  }

  /** Q11 (important stock): per-part shipped value from NATION_5
    * suppliers, kept when above 0.02% of the nation total — the HAVING
    * against a scalar subquery.
    */
  def q11ImportantStock(s: SparkSession, d: String): DataFrame = {
    val n5 = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_5")
      .select(col("s_suppkey"))
    val vals = Tables.lineitem(s, d)
      .join(broadcast(n5), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(14,2)") *
        col("l_quantity").cast("decimal(14,2)")).as("value"))
    val total = vals.agg(sum(col("value")).cast("double").as("tot"))
    vals.crossJoin(broadcast(total))
      .filter(col("value").cast("double") > col("tot") * 0.0002)
      .select(col("l_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** Q12 (ship-mode line counts): mode derived from the line number (no
    * l_shipmode column), lines shipped >90 days after ordering, split into
    * high/low-priority counts per mode.
    */
  def q12ShipmodePriority(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 90)
      .select(
        when(col("l_linenumber") % 3 === 0, "AIR")
          .when(col("l_linenumber") % 3 === 1, "RAIL")
          .otherwise("TRUCK").as("ship_mode"),
        col("o_orderpriority"))
      .groupBy(col("ship_mode"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_mode"))

  /** Q13 (customer order-count distribution): LEFT join with an extra
    * right-side predicate (non-urgent orders only) so zero-order customers
    * survive into the c_count=0 bucket.
    */
  def q13CustDistribution(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q15 (top supplier): quarterly revenue view; suppliers at the exact
    * maximum (decimal-exact equality against the scalar max).
    */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-04-01 00:00:00")
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_suppkey"), discPrice)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("disc_price")).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    Tables.supplier(s, d)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q16 (supplier counts by part attributes): distinct suppliers per
    * brand/type/size over selected sizes, excluding negative-balance
    * suppliers via NOT IN (the complaints stand-in).
    */
  def q16SupplierCnt(s: SparkSession, d: String): DataFrame = {
    val excluded = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(5, 10, 15, 20, 25))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q17 (small-quantity revenue): lines under a fifth of their part's
    * average quantity, for one brand. The correlated average is spelled
    * multiply-through (qty·cnt·5 < sum) so the comparison is exact decimal
    * on both engines — no divide, no reduction-order noise.
    */
  def q17SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitemPar(s, d)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("decimal(14,2)")).as("sum_qty"),
        count(lit(1)).as("cnt"))
    li.join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity").cast("decimal(14,2)") * col("cnt") * 5 < col("sum_qty"))
      .agg((sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  /** Q20 (potential part promotion): suppliers who shipped >400 units of
    * 'red' parts in 1996, resolved through the nested-IN chain of the
    * original (parts → qualifying supplier keys → supplier/nation).
    */
  def q20PotentialPromo(s: SparkSession, d: String): DataFrame = {
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val redParts = Tables.part(s, d).filter(col("p_name").like("red%"))
      .select(col("p_partkey"))
    val qualifying = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(14,2)")).as("q"))
      .filter(col("q") > 400)
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(broadcast(qualifying), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"))
      .orderBy(col("s_name"))
  }

  /** Q22 (global sales opportunity): positive-balance-above-average
    * customers with no URGENT orders (every synthetic customer has SOME
    * order, so the original's no-orders-in-7-years window maps to the
    * priority slice), rolled up by country code (nationkey mod 5). The
    * average is multiply-through again: bal·cnt > sum over the
    * positive-balance population.
    */
  def q22GlobalSales(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val avgPos = cust.filter(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast("decimal(14,2)")).as("sum_bal"),
        count(lit(1)).as("cnt"))
    cust
      .filter(col("c_nationkey") % 5 <= 2)
      .crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal").cast("decimal(14,2)") * col("cnt") > col("sum_bal"))
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 5).cast("int").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(14,2)")).cast("double").as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  /** DuckDB twins — same adapted shapes, same aliases, same decimal
    * spellings.
    */
  object Sql {
    private val dp =
      "CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0 - l_discount AS DECIMAL(14,4))"

    val q2MinCostSupplier: String =
      """WITH ps AS (SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
        |            FROM lineitem GROUP BY 1, 2),
        |es AS (SELECT s_suppkey, s_acctbal, s_name, n_name
        |       FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |       JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
        |cand AS (SELECT p_partkey, s_acctbal, s_name, n_name, cost
        |         FROM ps JOIN part ON l_partkey = p_partkey
        |         JOIN es ON l_suppkey = s_suppkey WHERE p_size = 15),
        |mn AS (SELECT p_partkey AS mk, MIN(cost) AS min_cost FROM cand GROUP BY 1)
        |SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.cost
        |FROM cand c JOIN mn ON c.p_partkey = mn.mk AND c.cost = mn.min_cost
        |ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey LIMIT 100""".stripMargin

    val q8MarketShare: String =
      s"""WITH amcust AS (SELECT c_custkey FROM customer
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'AMERICA'),
         |v AS (SELECT CAST(year(o_orderdate) AS INT) AS yr, n_name AS supp_nation,
         |             $dp AS disc_price
         |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |      JOIN supplier ON l_suppkey = s_suppkey
         |      JOIN nation ON s_nationkey = n_nationkey
         |      WHERE o_custkey IN (SELECT c_custkey FROM amcust)
         |        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
         |SELECT yr,
         |  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN disc_price
         |                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE)
         |    / CAST(CAST(SUM(disc_price) AS VARCHAR) AS DOUBLE) AS mkt_share
         |FROM v GROUP BY yr ORDER BY yr""".stripMargin

    val q9ProductProfit: String =
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
         |  CAST(SUM($dp - CAST(0.5 AS DECIMAL(4,2)) * CAST(p_retailprice AS DECIMAL(14,2))
         |           * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_profit
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2 ORDER BY nation, yr DESC""".stripMargin

    val q11ImportantStock: String =
      """WITH vals AS (SELECT l_partkey,
        |  SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS value
        |  FROM lineitem WHERE l_suppkey IN
        |    (SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |     WHERE n_name = 'NATION_5')
        |  GROUP BY l_partkey)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS value FROM vals
        |WHERE CAST(value AS DOUBLE) > (SELECT CAST(SUM(value) AS DOUBLE) FROM vals) * 0.0002
        |ORDER BY value DESC, l_partkey""".stripMargin

    val q12ShipmodePriority: String =
      """SELECT CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'AIR' WHEN 1 THEN 'RAIL'
        |            ELSE 'TRUCK' END AS ship_mode,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
        |GROUP BY ship_mode ORDER BY ship_mode""".stripMargin

    val q13CustDistribution: String =
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

    val q15TopSupplier: String =
      s"""WITH rev AS (SELECT l_suppkey, SUM($dp) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin

    val q16SupplierCnt: String =
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (5, 10, 15, 20, 25)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

    val q17SmallQtyRevenue: String =
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(14,2))) AS sum_qty,
        |             COUNT(*) AS cnt FROM lineitem GROUP BY 1) pp ON l_partkey = pk
        |WHERE p_brand = 'Brand#13'
        |  AND CAST(l_quantity AS DECIMAL(14,2)) * cnt * 5 < sum_qty""".stripMargin

    val q20PotentialPromo: String =
      """SELECT s_name, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(14,2))) > 400)
        |ORDER BY s_name""".stripMargin

    val q22GlobalSales: String =
      """WITH pos AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS sum_bal,
        |                    COUNT(*) AS cnt FROM customer WHERE c_acctbal > 0)
        |SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, count(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
        |FROM customer, pos
        |WHERE c_nationkey % 5 <= 2
        |  AND CAST(c_acctbal AS DECIMAL(14,2)) * cnt > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin
  }
}
