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
        min(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("min_price"),
        max(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("max_price"))
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
    Tables.lineitemPar(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(14,2)")).cast("double").as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))

  /** GROUPING SETS via the SQL surface (DataFrame API has no direct
    * equivalent — rollup/cube are its only grouping-analytics entry points).
    */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("_gs_lineitem")
    s.sql(
      """SELECT COALESCE(l_returnflag, '(all)') AS rf,
        |       COALESCE(l_linestatus, '(all)') AS ls,
        |       count(*) AS n
        |FROM _gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin)
  }

  /** UNION ALL (bag semantics, unlike setUnion's distinct). */
  def setUnionAll(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
      .unionAll(Tables.customer(s, d)
        .filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey")))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_custkey"))

  /** FULL OUTER join: customer vs supplier presence per nation. */
  def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("int").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val supp = Tables.supplier(s, d)
      .groupBy(col("s_nationkey").cast("int").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    cust.join(supp, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** PIVOT: order counts per priority × status (explicit value list so the
    * output schema is static, as required at scale — dynamic pivot implies
    * an extra distinct-collect pass on the driver).
    */
  def pivotStatus(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
      .orderBy(col("o_orderpriority"))

  /** Semi-structured access: extract a typed field from the JSON props
    * column (events.props = {"k": <int>}).
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.eventsPar(s, d)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k_bucket"))

  /** Deterministic per-group sampling: top-k per group by a multiplicative
    * pseudo-random hash computed in plain integer arithmetic, so both
    * engines order identically — the distributed replacement for
    * "ORDER BY random() LIMIT k per group" in training-data subsampling.
    */
  def samplePerGroup(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("rnd"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rnd", expr("pmod(pmod(doc_id, 1000000007L) * 2654435761L, 4294967296L)"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("source"), col("doc_id"), col("rn"))
      .orderBy(col("source"), col("rn"))
  }

  /** Approximate distinct-count (HLL++) next to the exact count. HLL
    * estimates differ across engines, so the raw estimate is not
    * oracle-able — instead the registry output reduces each estimate to
    * `within_tol = |approx − exact| ≤ 3·rsd·exact` (3 sigma at rsd 0.02;
    * holds with overwhelming probability), which IS deterministic on the
    * Spark side and differential-checkable against a literal-TRUE oracle.
    * ApproxSpec still asserts the numeric error bound on the raw values.
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame = {
    // exact and approximate distincts deliberately run as SEPARATE
    // aggregations joined at the end: a single agg mixing
    // count(DISTINCT k) with approx_count_distinct makes Spark group by k
    // first and carry BOTH HLL sketches per distinct key (~800 shuffled
    // longs per group at rsd 0.02 — measured 4-9 s at sf0.1); split, the
    // HLLs merge one sketch per partition and the exact path shuffles
    // bare keys (~0.7 s)
    val li = Tables.lineitem(s, d)
    val exact = li.agg(
      countDistinct(col("l_orderkey")).as("exact_orders"),
      countDistinct(col("l_partkey")).as("exact_parts"))
    val approx = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
    exact.crossJoin(approx).select(
      col("exact_orders"), col("exact_parts"),
      (abs(col("approx_orders") - col("exact_orders"))
        <= lit(3 * 0.02) * col("exact_orders")).as("orders_within_tol"),
      (abs(col("approx_parts") - col("exact_parts"))
        <= lit(3 * 0.02) * col("exact_parts")).as("parts_within_tol"))
  }

  /** DuckDB oracle for [[approxDistinct]]: the exact counts differentially
    * check; the tolerance booleans are literal TRUE — the Spark side must
    * have COMPUTED true for the hash to match.
    */
  val approxDistinctSql: String =
    """SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
      |       COUNT(DISTINCT l_partkey) AS exact_parts,
      |       TRUE AS orders_within_tol, TRUE AS parts_within_tol
      |FROM lineitem""".stripMargin

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
