package graft.operators

import graft.SparkSpec

/** Physical-plan regression guards for the scale-critical properties:
  * filter pushdown to the parquet scan, column pruning, broadcast of
  * dimension sides, partial aggregation before the exchange, and top-k
  * via TakeOrdered (never a global sort). These are the properties the
  * 100 TB posture depends on — a silent regression (a lost pushdown, a
  * sort sneaking back in) matters more than a few percent of runtime.
  */
class PlanShapeSpec extends SparkSpec {

  private def executed(q: org.apache.spark.sql.DataFrame): String = {
    q.collect() // let AQE finalize so the asserted plan is the real one
    // formatted explain: AQE's plan toString elides scan metadata
    // (PushedFilters/ReadSchema) inside query stages
    q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q6: all predicates pushed to the scan, only needed columns read") {
    val plan = executed(Joins.q6Forecast(spark, sf001))
    assert(plan.contains("PushedFilters:"), plan.take(400))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range not pushed")
    assert(plan.contains("LessThan(l_quantity"), "quantity filter not pushed")
    // projection pruning: the 8-column lineitem scan reads only 4 columns
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate"), "scan not pruned to 4 columns")
  }

  test("q5: dimension sides broadcast, no global sort before aggregation") {
    val plan = executed(Joins.q5LocalSupplier(spark, sf001))
    assert(plan.contains("BroadcastHashJoin"), "dims should broadcast")
    assert(plan.contains("HashAggregate"), "aggregation should be hash-based")
  }

  test("word_topk: partial aggregation before the exchange, top-k via TakeOrdered") {
    val plan = executed(Analytics.wordTopk(spark, sf001))
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "map-side combine missing")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("window_topk_per_key: single shuffle on the partition key") {
    val plan = executed(Windows.windowTopkPerKey(spark, sf001))
    assert(plan.contains("Window"), "window operator expected")
    // the window itself needs exactly one hashpartitioning exchange on
    // o_custkey; the trailing presentation sort is on the tiny result
    assert(plan.contains("hashpartitioning(o_custkey"), "keyed shuffle expected")
  }
}
