package graft.operators

import graft.SparkSpec

/** Error-bound contracts for approximate aggregates (no cross-engine oracle
  * exists — HLL++ implementations differ — so the bound itself is the
  * spec).
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct (rsd=0.02) is within 6% of exact (3σ)") {
    val row = Expressions.approxDistinct(spark, sf001)
      .as[(Long, Long, Boolean, Boolean)].collect().head
    val (exactOrders, exactParts, ordersOk, partsOk) = row
    assert(exactOrders > 0 && exactParts > 0)
    assert(ordersOk, "orders estimate outside 3σ tolerance")
    assert(partsOk, "parts estimate outside 3σ tolerance")
    // the raw estimates still obey the bound (belt and braces on the
    // reduced boolean)
    val li = graft.Tables.lineitem(spark, sf001)
    val approxOrders = li.selectExpr(
      "approx_count_distinct(l_orderkey, 0.02) AS a").as[Long].collect().head
    assert(math.abs(approxOrders - exactOrders).toDouble / exactOrders < 0.06,
      s"orders: approx=$approxOrders exact=$exactOrders")
  }

  test("approx_percentile brackets the exact percentile") {
    val df = graft.Tables.lineitem(spark, sf001)
    val approx = df.selectExpr(
        "approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000) AS p")
      .as[Seq[Double]].collect().head
    val exact = df.stat.approxQuantile("l_quantity", Array(0.25, 0.5, 0.75), 0.0)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= math.max(1.0, e * 0.05), s"approx=$a exact=$e")
    }
    assert(approx == approx.sorted, "percentiles must be monotone")
  }

  test("sample_per_group is deterministic and bounded") {
    val a = Expressions.samplePerGroup(spark, sf001)
      .as[(String, Long, Long)].collect().toSeq
    val b = Expressions.samplePerGroup(spark, sf001)
      .as[(String, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.groupBy(_._1).values.forall(_.size <= 3))
  }
}
