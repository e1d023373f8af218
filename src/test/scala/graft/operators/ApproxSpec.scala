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
      .as[(Long, Long, Long)].collect().head
    val (exact, approxOrders, approxParts) = row
    assert(math.abs(approxOrders - exact).toDouble / exact < 0.06,
      s"orders: approx=$approxOrders exact=$exact")
    assert(approxParts > 0)
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
