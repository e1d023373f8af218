package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry; each
  * SQL-expressible one gets a matching `oracleSql` (ANSI SQL for DuckDB over
  * the same parquet). Column names and aliases match exactly between the two
  * sides; aggregates over doubles go through decimal so results are
  * reduction-order independent (see graft.operators.Relational).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggGroupOrder(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P1-P4: scans & projections
    "scan_star_region" -> (Relational.scanStarRegion _),
    "proj_cols"        -> (Relational.projCols _),
    "proj_alias_lit"   -> (Relational.projAliasLit _),
    // P5-P10: filters
    "filter_eq_int"    -> (Relational.filterEqInt _),
    "filter_str_range" -> (Relational.filterStrRange _),
    "filter_ts"        -> (Relational.filterTs _),
    "empty_result"     -> (Relational.emptyResult _),
    "null_propagation" -> (Relational.nullPropagation _),
    // A1-A5: aggregations
    "agg_count_global" -> (Relational.aggCountGlobal _),
    "agg_sum_global"   -> (Relational.aggSumGlobal _),
    "agg_avg_cast"     -> (Relational.aggAvgCast _),
    "agg_min_max"      -> (Relational.aggMinMax _),
    "agg_group_order"  -> (Relational.aggGroupOrder _),
    // O1: sort/limit/distinct
    "orderby_desc_limit" -> (Relational.orderbyDescLimit _),
    "distinct_pairs"     -> (Relational.distinctPairs _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "scan_star_region" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "proj_cols" ->
      "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey",
    "proj_alias_lit" ->
      "SELECT o_orderkey AS id, 1 AS one, 'x' AS tag, true AS flag FROM orders ORDER BY id",
    "filter_eq_int" ->
      "SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey",
    "filter_str_range" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0.0 ORDER BY c_custkey",
    "filter_ts" ->
      "SELECT event_id, event_type, user_id FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id",
    "empty_result" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey > 900000000000 ORDER BY c_custkey",
    "null_propagation" ->
      "SELECT doc_id, CASE WHEN lang = 'en' THEN NULL ELSE lang END AS lang_or_null FROM documents ORDER BY doc_id",
    "agg_count_global" ->
      "SELECT count(*) AS cnt, count(DISTINCT l_orderkey) AS n_orders FROM lineitem",
    "agg_sum_global" ->
      "SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DECIMAL(18,2)) AS sum_qty FROM lineitem",
    "agg_avg_cast" ->
      "SELECT AVG(CAST(l_linenumber AS DOUBLE)) AS avg_line FROM lineitem",
    "agg_min_max" ->
      "SELECT MIN(p_size) AS min_size, MAX(p_size) AS max_size, MIN(p_name) AS min_name, MAX(p_name) AS max_name FROM part",
    "agg_group_order" ->
      "SELECT o_orderpriority, CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(18,2)) AS total, count(*) AS n FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "orderby_desc_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "distinct_pairs" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",
  )
}
