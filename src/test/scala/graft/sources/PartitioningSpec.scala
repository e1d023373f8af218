package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two levers that matter most at 100 TB, asserted at the plan level:
  *
  *   - partitioned layout → partition PRUNING (selective queries touch only
  *     matching directories, not the full table);
  *   - bucketed layout → co-located joins (no Exchange on either side of a
  *     fact⋈fact join on the bucket key).
  */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("hive-partitioned write + filter → partition pruning in the scan") {
    val dir = tmpDir("part-events")
    graft.Tables.events(spark, sf001)
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$dir/ev")

    val q = spark.read.parquet(s"$dir/ev").filter($"event_type" === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert("PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      "filter must reach PartitionFilters, not post-scan")
    // pruned read returns exactly the partition
    val expected = graft.Tables.events(spark, sf001)
      .filter($"event_type" === "purchase").count()
    assert(q.count() == expected)
    // and the unpruned directory listing confirms one dir per type
    val dirs = new java.io.File(s"$dir/ev").listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("event_type=click", "event_type=error",
      "event_type=purchase", "event_type=signup", "event_type=view"))
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    // external tables via option("path") — warehouse dir (a static conf)
    // stays untouched
    val wh = tmpDir("bucket-wh")
    val s = spark
    import org.apache.spark.sql.SaveMode
    graft.Tables.orders(s, sf001)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b")
      .saveAsTable("orders_b")
    graft.Tables.lineitem(s, sf001)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b")
      .saveAsTable("lineitem_b")
    try {
      // disable broadcast so the join strategy question is real
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("orders_b")
        .join(s.table("lineitem_b"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed join: no Exchange below the join (only the final agg may
      // exchange on the group key)
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan.take(400))
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange"),
        "join inputs must be co-located by bucketing:\n" + plan.take(1200))
      // and it computes the right answer
      val viaBuckets = joined.as[(String, Long)].collect().toMap
      val direct = graft.Tables.orders(s, sf001)
        .join(graft.Tables.lineitem(s, sf001), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(viaBuckets == direct)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
