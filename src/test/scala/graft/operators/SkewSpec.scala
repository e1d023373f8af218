package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a pathologically skewed key") {
    // 50k rows on one hot key + a tail of 10 normal keys
    val left = spark.range(50000).select(lit(1L).as("k"), $"id".as("v"))
      .union(spark.range(10).select(($"id" + 2).as("k"), $"id".as("v")))
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (99L, "unmatched"))
      .toDF("k", "name")
    val plain = left.join(right, Seq("k"))
      .select($"k", $"v", $"name").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
      .select($"k", $"v", $"name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == 1L) == 50000)
  }

  test("saltedJoin physically joins on (key, salt)") {
    val left = spark.range(100).select(lit(1L).as("k"), $"id".as("v"))
    val right = Seq((1L, "x")).toDF("k", "name")
    val plan = Skew.saltedJoin(left, right, "k", salts = 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), s"salt column missing from plan:\n$plan")
  }
}
