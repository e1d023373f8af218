package graft

import graft.params.Sql._
import org.apache.spark.sql.types._

/** End-to-end engine spec recreating the reference's seeded fixture tables
  * and golden assertions (FIXTURES.md §A; reference
  * tests/IntegrationTests/Scripts/insert/01-test-data.sql and the golden
  * values in TrinoClientIntegrationTests.cs / QueryScalarTests.cs /
  * TrinoAdoNetIntegrationTests.cs).
  */
case class User(id: Int, username: String, email: Option[String], phone: Option[String])

class GraftEngineSpec extends SparkSpec {
  import spark.implicits._

  lazy val engine: GraftEngine = {
    val e = new GraftEngine(spark, tmpDir("graft-engine-wh"))
    // category_data (FIXTURES.md): totals A=250, B=500
    e.registerView("category_data",
      Seq((100L, "A"), (200L, "B"), (150L, "A"), (300L, "B")).toDF("amount", "category"))
    // shared_data subset used by typed-mapping tests
    e.registerView("shared_data",
      Seq(
        (1, "test", Some("alice"), Some("alice@example.com"), Some("555-0001")),
        (2, "data", Some("bob"), None: Option[String], Some("555-0002")),
        (3, null, Some("charlie"), Some("charlie@example.com"), None: Option[String]))
        .toDF("id", "value", "username", "email", "phone"))
    // scalar_test golden fixture (QueryScalarTests.cs)
    e.registerView("scalar_test",
      Seq(
        (1, 10, "apple", true, "2024-01-01 08:00:00", BigDecimal("100.50"), "A"),
        (2, 20, "banana", false, "2024-01-02 09:30:00", BigDecimal("150.25"), "A"),
        (3, 30, "cherry", true, "2024-01-03 10:45:00", BigDecimal("100.25"), "B"))
        .toDF("id", "int_value", "string_value", "bool_value", "ts_str", "decimal_value", "category")
        .withColumn("datetime_value", $"ts_str".cast("timestamp")).drop("ts_str"))
    e
  }

  test("raw query: aggregate with group/order (TrinoClientIntegrationTests.cs:87-95)") {
    val rows = engine.query(sql"SELECT category, SUM(amount) AS total FROM category_data GROUP BY category ORDER BY category")
      .as[(String, Long)].collect()
    assert(rows.toSeq == Seq(("A", 250L), ("B", 500L)))
  }

  test("queryAs[T]: typed rows with NULL→None (AthenaClientTests.cs:32-61)") {
    val users = engine.queryAs[User](
      sql"SELECT id, username, email, phone FROM shared_data ORDER BY id")
    assert(users == Seq(
      User(1, "alice", Some("alice@example.com"), Some("555-0001")),
      User(2, "bob", None, Some("555-0002")),
      User(3, "charlie", Some("charlie@example.com"), None)))
  }

  test("parameterized equality filter (AthenaClientTests.cs:90)") {
    val userId = 2
    val got = engine.queryAs[User](
      sql"SELECT id, username, email, phone FROM shared_data WHERE id = $userId")
    assert(got.map(_.username) == Seq("bob"))
  }

  test("empty result → Nil (AthenaClientTests.cs:57-61)") {
    assert(engine.queryAs[User](
      sql"SELECT id, username, email, phone FROM shared_data WHERE id > 999") == Nil)
  }

  test("queryScalar golden values (QueryScalarTests.cs:14-132)") {
    assert(engine.queryScalar[Int](sql"SELECT MAX(int_value) FROM scalar_test") == Some(30))
    assert(engine.queryScalar[Int](sql"SELECT MIN(int_value) FROM scalar_test") == Some(10))
    assert(engine.queryScalar[String](sql"SELECT MIN(string_value) FROM scalar_test") == Some("apple"))
    // decimal sum exact: 100.50+150.25+100.25 = 351.00 (QueryScalarTests.cs:109-115)
    assert(engine.queryScalar[BigDecimal](
      sql"SELECT CAST(SUM(decimal_value) AS DECIMAL(10,2)) FROM scalar_test") == Some(BigDecimal("351.00")))
    // filtered sum (QueryScalarTests.cs:125-127)
    val cat = "A"
    assert(engine.queryScalar[Int](
      sql"SELECT SUM(int_value) FROM scalar_test WHERE category = $cat") == Some(30))
    // empty set → None (QueryScalarTests.cs:44-50)
    assert(engine.queryScalar[Int](
      sql"SELECT MAX(int_value) FROM scalar_test WHERE id > 999") == None)
  }

  test("executeNonQuery returns -1 for DDL-ish, count for count-returning statements") {
    assert(engine.executeNonQuery(sql"SELECT COUNT(*) FROM scalar_test") == 3L)
  }

  test("executeBatch runs statements in parallel (TrinoIcebergStack.cs:233-257)") {
    engine.executeBatch(Seq(
      sql"SELECT COUNT(*) FROM scalar_test",
      sql"SELECT COUNT(*) FROM category_data",
      sql"SELECT 1"))
  }

  test("time-travel SQL composes with WHERE/ORDER BY end-to-end (AthenaClientTests.cs:348-391)") {
    engine.catalog.createSchema("tt")
    engine.catalog.createTable("tt", "events", StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType))))
    val s1 = engine.catalog.insert("tt", "events",
      Seq((1L, "login"), (2L, "click")).toDF("event_id", "event_type"))
    engine.catalog.insert("tt", "events",
      Seq((3L, "purchase"), (4L, "logout")).toDF("event_id", "event_type"))
    val asOf = java.time.Instant.ofEpochMilli(s1.committedAtMillis)
    val stmt = sql"SELECT event_id, event_type FROM tt.events FOR TIMESTAMP AS OF TIMESTAMP $asOf WHERE event_id >= 1 ORDER BY event_id"
    val got = engine.query(stmt).as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "login"), (2L, "click")))
  }

  test("SQL INSERT INTO VALUES commits a snapshot and returns rows affected (S5/C5)") {
    engine.catalog.createSchema("ins")
    engine.catalog.createTable("ins", "people", StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType))))
    val n = engine.executeNonQuery(sql"INSERT INTO ins.people VALUES (1, 'Alice'), (2, ${"Bo'b"})")
    assert(n == 2)
    val n2 = engine.executeNonQuery(sql"INSERT INTO ins.people VALUES (3, 'Carol')")
    assert(n2 == 1)
    // two INSERTs = two snapshots (commit model)
    assert(engine.catalog.snapshots("ins", "people").size == 2)
    val rows = engine.catalog.readLatest("ins", "people")
      .orderBy($"id").as[(Int, String)].collect().toSeq
    assert(rows == Seq((1, "Alice"), (2, "Bo'b"), (3, "Carol")))
  }

  test("unload through the engine (C4)") {
    val target = tmpDir("engine-unload") + "/exp"
    val resp = engine.unload(sql"SELECT id, username FROM shared_data", target)
    assert(resp.rowCount == 3)
    assert(spark.read.parquet(target).count() == 3)
  }

  test("string parameters round-trip through Spark's parser (backslashes, quotes)") {
    import graft.params.Sql._
    for (v <- Seq("plain", "it's", "a\\nb", "x\\", "\\' OR 1=1 --", "tab\there", "uni \u00e9\u4e2d")) {
      val got = engine.queryScalar[String](sql"SELECT $v AS v")
      assert(got.contains(v), s"round-trip failed for <$v>: got $got")
    }
  }
}
