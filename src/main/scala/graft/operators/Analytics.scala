package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Analytics extension surface past the round-1 inventory: exact statistical
  * moments, rank-based medians, arg-min/max aggregates, ordered string
  * aggregation, word frequencies, temporal bucketing/interval arithmetic,
  * regexes, batch sessionization, non-equi (range) joins, multiset set ops,
  * struct projection, histograms, filtered aggregates and CTE chains.
  *
  * Every operator here is oracle-checked. The statistical ops follow the
  * exactness discipline of graft.operators.Relational: moments are derived
  * from DECIMAL power sums (reduction-order independent), converted to
  * double once, and the remaining arithmetic is written as the *same*
  * double expression tree on both engines, so results compare bit-exact.
  */
object Analytics {

  private def dec2(c: String) = col(c).cast("decimal(14,2)")

  /** Exact sample variance / stddev from decimal power sums. */
  def statsMoments(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2("l_quantity")).cast("double").as("sx"),
        sum(dec2("l_quantity") * dec2("l_quantity")).cast("double").as("sxx"))
      .withColumn("mean_qty", col("sx") / col("n"))
      // n=1 group → NULL (no sample variance), not a division by zero;
      // greatest(·,0) clamps the tiny rounding-negative a zero-variance
      // group can produce. Oracle SQL mirrors both guards verbatim.
      .withColumn("var_qty",
        when(col("n") > 1, greatest(
          (col("n") * col("sxx") - col("sx") * col("sx")) / (col("n") * (col("n") - 1)),
          lit(0.0)))
          .otherwise(lit(null).cast("double")))
      .withColumn("sd_qty", sqrt(col("var_qty")))
      .select(col("l_returnflag").as("rf"), col("n"),
        col("mean_qty"), col("var_qty"), col("sd_qty"))
      .orderBy(col("rf"))

  /** Exact Pearson correlation from decimal cross/power sums.
    *
    * The exact decimal sums cross into double through a STRING bridge:
    * price-squared cross-sums carry unscaled values past 2^53, where
    * DuckDB's native decimal→double cast (int128→double, THEN divide by
    * 10^scale — two roundings) can land one ulp away from Spark's
    * correctly-rounded BigDecimal.doubleValue(). decimal→string is exact
    * and string→double is correctly rounded (strtod) in both engines, so
    * the bridged doubles are bit-identical.
    */
  def corrQtyPrice(s: SparkSession, d: String): DataFrame =
    Tables.lineitemPar(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2("l_quantity")).cast("string").cast("double").as("sx"),
        sum(dec2("l_extendedprice")).cast("string").cast("double").as("sy"),
        sum(dec2("l_quantity") * dec2("l_quantity")).cast("string").cast("double").as("sxx"),
        sum(dec2("l_extendedprice") * dec2("l_extendedprice")).cast("string").cast("double").as("syy"),
        sum(dec2("l_quantity") * dec2("l_extendedprice")).cast("string").cast("double").as("sxy"))
      // radicands clamped at 0: a constant column's power-sum identity can
      // round to a tiny negative, where Spark returns NaN but DuckDB errors
      .withColumn("corr_qp",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(greatest(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0))) *
            sqrt(greatest(col("n") * col("syy") - col("sy") * col("sy"), lit(0.0)))))
      .select(col("l_returnflag").as("rf"), col("n"), col("corr_qp"))
      .orderBy(col("rf"))

  /** Exact median per group via rank selection (both middle rows averaged —
    * no engine-specific interpolation).
    */
  def medianRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val cw = Window.partitionBy(col("o_orderpriority"))
    Tables.ordersPar(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(cw))
      .filter(col("rn") === expr("(cnt + 1) div 2") || col("rn") === expr("cnt div 2 + 1"))
      .groupBy(col("o_orderpriority"))
      .agg((sum(col("o_totalprice")) / count(lit(1))).as("median_price"))
      .select(col("o_orderpriority").as("priority"), col("median_price"))
      .orderBy(col("priority"))
  }

  /** Arg-min/arg-max aggregates keyed on the unique o_orderkey. */
  def minmaxBy(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("max_by(o_totalprice, o_orderkey)").as("last_price"),
        expr("min_by(o_totalprice, o_orderkey)").as("first_price"),
        max(col("o_orderkey")).as("last_key"))
      .select(col("o_orderpriority").as("priority"),
        col("last_price"), col("first_price"), col("last_key"))
      .orderBy(col("priority"))

  /** Ordered string aggregation (LISTAGG): nations per region. */
  def listaggRegions(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_nations"),
        array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy(col("r_name"))

  /** Word frequency top-20 (explode/UNNEST surface) with a total tiebreak
    * order. The classic first distributed job — shuffle carries (word,
    * partial count), top-k via TakeOrdered, no global sort.
    */
  def wordTopk(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(20)

  /** Bigram (2-gram) frequency top-20 — the n-gram extraction building
    * block (shingle generation without hashing). Same TakeOrdered shape as
    * wordTopk; the n-gram expansion rides the scan.
    */
  def ngramTopk(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i + 1]))"))
        .as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(20)

  /** Temporal bucketing: monthly event rollup via date_trunc. */
  def dateTruncMonth(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("month", col("ts")).cast("date").as("month"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,4)")).cast("double").as("total_value"))
      .orderBy(col("month"))

  /** Interval arithmetic + ISO day-of-week extraction (both engines agree
    * on isodow; Spark's dayofweek/DuckDB's dayofweek disagree on the
    * Sunday origin, so weekday()+1 is the portable spelling).
    */
  def intervalDow(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(expr("weekday(cast(o_orderdate + interval 30 day as date)) + 1")
        .cast("int").as("due_dow"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("due_dow"))

  /** Regex extraction + global replacement (pattern kept free of escape
    * sequences — Spark and DuckDB unescape quoted literals differently).
    */
  def regexpOps(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        length(regexp_replace(col("p_name"), "[aeiou]", "")).cast("int").as("consonant_len"))
      .orderBy(col("p_partkey"))

  /** Batch sessionization: 30-minute-gap session starts per user (the
    * batch twin of streaming session_window; one shuffle on user_id).
    */
  def sessionizeBatch(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.eventsPar(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        sum(col("new_session")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Non-equi (range) join against a broadcast inline tier table — the
    * bounded-dimension banding join (BroadcastNestedLoop on 3 rows; at
    * scale the fact side never shuffles).
    */
  def rangeJoinBuckets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tiers = Seq(
      (0.0, 50000.0, "low"),
      (50000.0, 200000.0, "mid"),
      (200000.0, 1000000000000.0, "high")).toDF("lo", "hi", "tier")
    Tables.orders(s, d)
      .join(broadcast(tiers),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("tier"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2("o_totalprice")).cast("double").as("total"))
      .orderBy(col("tier"))
  }

  /** INTERSECT ALL — multiset semantics (duplicates preserved). */
  def setIntersectAll(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      .intersectAll(Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
      .orderBy(col("nationkey"))

  /** EXCEPT ALL — multiset difference. */
  def setExceptAll(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
      .exceptAll(Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
      .orderBy(col("nationkey"))

  /** Struct build + nested-field projection. */
  def structAccess(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        struct(col("o_orderpriority").as("p"), col("o_totalprice").as("tp")).as("s"))
      .select(col("o_orderkey"), col("s.p").as("pri"), col("s.tp").as("price"))
      .orderBy(col("o_orderkey"))
      .limit(100)

  /** Fixed-width histogram via floor arithmetic (portable width_bucket). */
  def histogramPrice(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(least(floor(col("o_totalprice") / 50000.0), lit(10.0)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** Filtered/conditional aggregates (COUNT FILTER / count_if / CASE-sum). */
  def condAggFilter(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("count_if(o_orderstatus = 'F')").as("n_f"),
        count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "O", dec2("o_totalprice"))).cast("double").as("open_total"))
      .select(col("o_orderpriority").as("priority"), col("n_f"),
        (col("n_f").cast("double") / col("n")).as("share_f"), col("open_total"))
      .orderBy(col("priority"))

  /** RANGE window frame (value-based, unlike the ROWS frames in
    * graft.operators.Windows): per user, exact sum of event values within
    * the trailing 300-second window of each event's epoch second.
    */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-300L, Window.currentRow)
    Tables.eventsPar(s, d)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        col("value").cast("decimal(14,4)").as("v"))
      .withColumn("trailing_5m", sum(col("v")).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("trailing_5m"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** ANSI NOT IN three-valued-logic semantics: a NULL in the subquery list
    * makes NOT IN never-true, so the count is 0 — the classic SQL trap,
    * asserted identical on both engines.
    */
  def notInNull(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(notInNullSql)
  }

  private[operators] val notInNullSql: String =
    """SELECT count(*) AS n FROM orders WHERE o_custkey NOT IN
      |(SELECT CASE WHEN c_custkey = 1 THEN NULL ELSE c_custkey END FROM customer)""".stripMargin

  /** UNPIVOT: the pivoted status counts stacked back to rows (Spark
    * `stack`; the oracle uses the equivalent UNION ALL — both produce the
    * long form).
    */
  def unpivotStatus(s: SparkSession, d: String): DataFrame =
    Expressions.pivotStatus(s, d)
      .select(col("o_orderpriority"),
        expr("stack(3, 'F', f_cnt, 'O', o_cnt, 'P', p_cnt) AS (status, cnt)"))
      .orderBy(col("o_orderpriority"), col("status"))

  /** Deterministic fraction-based stratified sampling: keep ~10% per
    * stratum by an engine-portable integer hash of the key (the
    * reproducible replacement for `TABLESAMPLE` in training-data
    * subsampling — rerunning the pipeline selects the same rows).
    */
  def stratifiedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("keep",
        expr("pmod(pmod(pmod(doc_id, 1000000007L) * 2654435761L, 4294967296L), 100L)") < 10)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        expr("count_if(keep)").as("n_sampled"),
        (expr("count_if(keep)").cast("double") / count(lit(1))).as("ratio"))
      .orderBy(col("source"))

  /** The shared CTE-chain text — both engines execute it verbatim. */
  private[operators] val cteChainSql: String =
    """WITH busy AS (
      |  SELECT o_custkey, count(*) AS n_ord FROM orders
      |  GROUP BY o_custkey HAVING count(*) >= 10
      |)
      |SELECT c_mktsegment, count(*) AS n_busy, CAST(SUM(n_ord) AS BIGINT) AS n_orders
      |FROM customer JOIN busy ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Multi-CTE SQL chain through the SQL surface (views over the same
    * parquet; identical text runs on DuckDB).
    */
  def cteChain(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(cteChainSql)
  }

  /** DuckDB oracle SQL for every operator above. */
  object Sql {
    val statsMoments: String =
      """SELECT rf, n, mean_qty, var_qty, sqrt(var_qty) AS sd_qty FROM (
        |  SELECT rf, n, sx / n AS mean_qty,
        |         CASE WHEN n > 1 THEN greatest((n * sxx - sx * sx) / (n * (n - 1)), 0.0) ELSE NULL END AS var_qty
        |  FROM (SELECT l_returnflag AS rf, count(*) AS n,
        |          CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sx,
        |          CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sxx
        |        FROM lineitem GROUP BY 1) t) u ORDER BY rf""".stripMargin

    // decimal sums bridge to double via VARCHAR (exact → correctly-rounded
    // strtod): DuckDB's direct decimal→double cast double-rounds past 2^53
    // unscaled and can sit one ulp off Spark's BigDecimal.doubleValue()
    val corrQtyPrice: String =
      """SELECT rf, n,
        |  (n * sxy - sx * sy) / (sqrt(greatest(n * sxx - sx * sx, 0.0)) * sqrt(greatest(n * syy - sy * sy, 0.0))) AS corr_qp
        |FROM (SELECT l_returnflag AS rf, count(*) AS n,
        |        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sxx,
        |        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS syy,
        |        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sxy
        |      FROM lineitem GROUP BY 1) t ORDER BY rf""".stripMargin

    val medianRank: String =
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |  COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt FROM orders)
        |SELECT o_orderpriority AS priority, SUM(o_totalprice) / COUNT(*) AS median_price
        |FROM r WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
        |GROUP BY 1 ORDER BY priority""".stripMargin

    val minmaxBy: String =
      ("SELECT o_orderpriority AS priority, max_by(o_totalprice, o_orderkey) AS last_price, " +
        "min_by(o_totalprice, o_orderkey) AS first_price, max(o_orderkey) AS last_key " +
        "FROM orders GROUP BY 1 ORDER BY priority")

    val listaggRegions: String =
      ("SELECT r_name, count(*) AS n_nations, string_agg(n_name, ',' ORDER BY n_name) AS nations " +
        "FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name")

    val wordTopk: String =
      ("SELECT w, count(*) AS cnt FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w " +
        "FROM documents) t GROUP BY w ORDER BY cnt DESC, w LIMIT 20")

    val ngramTopk: String =
      ("SELECT ngram, count(*) AS cnt FROM (" +
        "SELECT array_to_string(toks[i:i+1], ' ') AS ngram FROM (" +
        "SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM (" +
        "SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents) a " +
        "WHERE len(toks) >= 2) b) c GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20")

    val dateTruncMonth: String =
      ("SELECT CAST(date_trunc('month', ts) AS DATE) AS month, count(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1 ORDER BY month")

    val intervalDow: String =
      ("SELECT CAST(isodow(CAST(o_orderdate + INTERVAL 30 DAY AS DATE)) AS INT) AS due_dow, " +
        "count(*) AS n FROM orders GROUP BY 1 ORDER BY due_dow")

    val regexpOps: String =
      ("SELECT p_partkey, regexp_extract(p_name, '([a-z]+)', 1) AS first_word, " +
        "CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS INT) AS consonant_len " +
        "FROM part ORDER BY p_partkey")

    val sessionizeBatch: String =
      """WITH g AS (SELECT user_id, ts,
        |  LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN prev_ts IS NULL OR
        |    CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

    val rangeJoinBuckets: String =
      ("SELECT tier, count(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total " +
        "FROM orders JOIN (VALUES (0.0, 50000.0, 'low'), (50000.0, 200000.0, 'mid'), " +
        "(200000.0, 1000000000000.0, 'high')) t(lo, hi, tier) " +
        "ON o_totalprice >= lo AND o_totalprice < hi GROUP BY tier ORDER BY tier")

    val setIntersectAll: String =
      ("SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer INTERSECT ALL " +
        "SELECT CAST(s_nationkey AS INT) FROM supplier ORDER BY nationkey")

    val setExceptAll: String =
      ("SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer EXCEPT ALL " +
        "SELECT CAST(s_nationkey AS INT) FROM supplier ORDER BY nationkey")

    val structAccess: String =
      ("SELECT o_orderkey, (s).p AS pri, (s).tp AS price FROM " +
        "(SELECT o_orderkey, struct_pack(p := o_orderpriority, tp := o_totalprice) AS s " +
        "FROM orders) t ORDER BY o_orderkey LIMIT 100")

    val histogramPrice: String =
      ("SELECT CAST(least(floor(o_totalprice / 50000.0), 10.0) AS INT) AS bucket, count(*) AS n " +
        "FROM orders GROUP BY 1 ORDER BY bucket")

    val condAggFilter: String =
      ("SELECT o_orderpriority AS priority, count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f, " +
        "CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / count(*) AS share_f, " +
        "CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS open_total " +
        "FROM orders GROUP BY 1 ORDER BY priority")

    val cteChain: String = cteChainSql

    val windowRangeFrame: String =
      ("SELECT user_id, event_id, CAST(SUM(CAST(value AS DECIMAL(14,4))) OVER " +
        "(PARTITION BY user_id ORDER BY epoch_s RANGE BETWEEN 300 PRECEDING AND CURRENT ROW) " +
        "AS DOUBLE) AS trailing_5m FROM " +
        "(SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, value FROM events) t " +
        "ORDER BY user_id, event_id")

    val notInNull: String = notInNullSql

    val stratifiedSample: String =
      ("SELECT source, count(*) AS n_total, " +
        "count(*) FILTER (WHERE (doc_id % 1000000007) * 2654435761 % 4294967296 % 100 < 10) AS n_sampled, " +
        "CAST(count(*) FILTER (WHERE (doc_id % 1000000007) * 2654435761 % 4294967296 % 100 < 10) AS DOUBLE) / count(*) AS ratio " +
        "FROM documents GROUP BY source ORDER BY source")

    val unpivotStatus: String =
      ("WITH p AS (SELECT o_orderpriority, " +
        "count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt, " +
        "count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt, " +
        "count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt FROM orders GROUP BY o_orderpriority) " +
        "SELECT o_orderpriority, status, cnt FROM (" +
        "SELECT o_orderpriority, 'F' AS status, f_cnt AS cnt FROM p " +
        "UNION ALL SELECT o_orderpriority, 'O', o_cnt FROM p " +
        "UNION ALL SELECT o_orderpriority, 'P', p_cnt FROM p) u " +
        "ORDER BY o_orderpriority, status")
  }
}
