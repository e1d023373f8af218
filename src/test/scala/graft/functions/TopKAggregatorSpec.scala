package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k aggregator agrees with the window row_number formulation") {
    val orders = graft.Tables.orders(spark, sf001)

    // Aggregator path: k entries per partition reach the shuffle
    val agg = new TopKByScore(3).toColumn
    val viaAgg = orders
      .select($"o_orderpriority", struct($"o_totalprice", $"o_orderkey").as("p"))
      .as[(String, (Double, Long))]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .collect()
      .map { case (prio, topk) => prio -> topk.map(_._2).toList }
      .toMap

    // window path (the per-row shuffle formulation)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"o_orderkey", $"rn")
      .as[(String, Long, Int)].collect()
      .groupBy(_._1)
      .map { case (prio, rows) => prio -> rows.sortBy(_._3).map(_._2).toList }

    assert(viaAgg == viaWindow)
    assert(viaAgg.values.forall(_.size == 3))
  }

  test("aggregator input mapping: typed pipeline compiles through KeyValueGroupedDataset") {
    val got = Seq((1.0, 10L), (5.0, 11L), (3.0, 12L), (5.0, 9L))
      .toDS()
      .groupByKey(_ => "all")
      .agg(new TopKByScore(2).toColumn)
      .collect().head._2
    // score desc, tie by id asc
    assert(got == Seq((5.0, 9L), (5.0, 11L)))
  }
}
