package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics specs for the round-2 analytics operators on planted fixtures
  * (the driver's DuckDB oracle covers them differentially at sf0.01; these
  * pin the hand-checkable contracts).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def plantOrders(rows: Seq[(Long, Long, String, String, java.sql.Timestamp, Double)]): String = {
    val dir = tmpDir("an-orders")
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  test("medianRank: odd group picks middle, even group averages the two middles") {
    val dir = plantOrders(Seq(
      (1L, 1L, "F", "A", t0, 10.0),
      (2L, 1L, "F", "A", t0, 20.0),
      (3L, 1L, "F", "A", t0, 99.0), // odd group: median 20
      (4L, 1L, "F", "B", t0, 10.0),
      (5L, 1L, "F", "B", t0, 30.0),
      (6L, 1L, "F", "B", t0, 50.0),
      (7L, 1L, "F", "B", t0, 90.0))) // even group: (30+50)/2 = 40
    val got = Analytics.medianRank(spark, dir)
      .as[(String, Double)].collect().toMap
    assert(got == Map("A" -> 20.0, "B" -> 40.0))
  }

  test("statsMoments matches the two-pass variance on a tiny group") {
    val dir = tmpDir("an-li")
    Seq((1L, "A", 2.0, 10.0), (2L, "A", 4.0, 20.0), (3L, "A", 6.0, 30.0))
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val row = Analytics.statsMoments(spark, dir)
      .select($"rf", $"n", $"mean_qty", $"var_qty").as[(String, Long, Double, Double)]
      .collect().head
    assert(row == (("A", 3L, 4.0, 4.0))) // mean 4, sample var ((4+0+4)/2)=4
    val corr = Analytics.corrQtyPrice(spark, dir)
      .select($"corr_qp").as[Double].collect().head
    assert(math.abs(corr - 1.0) < 1e-12) // perfectly linear
  }

  test("sessionizeBatch counts 30-minute-gap sessions per user") {
    val dir = tmpDir("an-ev")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // user 1: events at 0, 10, 70 min → 2 sessions; user 2: single event
    // Tables.events passes TimestampType columns through untouched (the
    // nanos normalization only fires on LongType)
    Seq((1L, 1L, "click", ts(0), 1.0, "{}"),
      (2L, 1L, "click", ts(10), 1.0, "{}"),
      (3L, 1L, "click", ts(70), 1.0, "{}"),
      (4L, 2L, "view", ts(5), 1.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.sessionizeBatch(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L), (2L, 1L, 1L)))
  }

  test("setExceptAll keeps multiset multiplicities") {
    val dir = tmpDir("an-cs")
    Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 8L))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 7L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = Analytics.setExceptAll(spark, dir).as[Int].collect().toSeq
    assert(got == Seq(7, 7, 8)) // one 7 removed, one 8 untouched
  }

  test("rangeJoinBuckets buckets every order exactly once") {
    val dir = plantOrders(Seq(
      (1L, 1L, "F", "A", t0, 100.0),
      (2L, 1L, "F", "A", t0, 50000.0),  // boundary → mid
      (3L, 1L, "F", "A", t0, 300000.0)))
    val got = Analytics.rangeJoinBuckets(spark, dir)
      .select($"tier", $"n").as[(String, Long)].collect().toMap
    assert(got == Map("low" -> 1L, "mid" -> 1L, "high" -> 1L))
  }

  test("wordTopk orders by count desc then word, with a hard limit") {
    val dir = tmpDir("an-docs")
    Seq((1L, "b b b a a c", "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Analytics.wordTopk(spark, dir).as[(String, Long)].collect().toSeq
    assert(got == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }
}
