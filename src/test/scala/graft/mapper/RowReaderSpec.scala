package graft.mapper

import graft.{GraftEngine, SparkSpec}
import graft.params.Sql._

/** Streaming row-reader facade spec, mirroring the reference's ADO.NET
  * reader scenarios (tests/IntegrationTests/TrinoAdoNetIntegrationTests
  * .cs:57-119): incremental iteration, IsDBNull on nullable fields,
  * FieldCount/GetName metadata — plus the engine contract the reference
  * can't test: the result is NOT fully materialized on the driver (one
  * partition at a time via toLocalIterator).
  */
case class ReaderUser(id: Int, username: String, email: Option[String])

class RowReaderSpec extends SparkSpec {
  import spark.implicits._

  lazy val engine: GraftEngine = {
    val e = new GraftEngine(spark, tmpDir("graft-reader-wh"))
    e.registerView("reader_users",
      Seq(
        (1, "alice", Some("alice@example.com")),
        (2, "bob", None: Option[String]),
        (3, "charlie", Some("charlie@example.com")))
        .toDF("id", "username", "email"))
    e
  }

  test("executeReader: incremental iteration + field metadata (TrinoAdoNetIntegrationTests.cs:57-91)") {
    val r = engine.executeReader(
      sql"SELECT id, username, email FROM reader_users ORDER BY id")
    // metadata is available before the first read()
    assert(r.fieldCount == 3)
    assert((0 until r.fieldCount).map(r.fieldName) == Seq("id", "username", "email"))
    assert(r.ordinal("email") == 2)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    while (r.read())
      seen += ((r.getAs[Int]("id"), r.getAs[String]("username")))
    assert(seen.toSeq == Seq((1, "alice"), (2, "bob"), (3, "charlie")))
    assert(!r.read()) // stays exhausted
  }

  test("executeReader: IsDBNull / Option access on nullable fields (TrinoAdoNetIntegrationTests.cs:93-119)") {
    val r = engine.executeReader(
      sql"SELECT id, email FROM reader_users ORDER BY id")
    val emails = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    while (r.read()) {
      assert(r.isNull("email") == r.isNull(1))
      emails += r.getOption[String]("email")
    }
    assert(emails.toSeq ==
      Seq(Some("alice@example.com"), None, Some("charlie@example.com")))
  }

  test("executeReader before read() fails with a positioned-cursor error") {
    val r = engine.executeReader(sql"SELECT id FROM reader_users")
    val e = intercept[IllegalStateException](r.get(0))
    assert(e.getMessage.contains("read()"))
  }

  test("queryIterator[T]: typed streaming with snake→camel mapping") {
    val it = engine.queryIterator[ReaderUser](
      sql"SELECT id, username, email FROM reader_users ORDER BY id")
    assert(it.next() == ReaderUser(1, "alice", Some("alice@example.com")))
    assert(it.next() == ReaderUser(2, "bob", None))
    assert(it.next() == ReaderUser(3, "charlie", Some("charlie@example.com")))
    assert(!it.hasNext)
  }

  test("reader streams partition-at-a-time — no full materialization") {
    // a 16-partition source counts, via accumulator, how many partitions
    // actually evaluated; reading a handful of rows from the front must
    // not evaluate them all (toLocalIterator may prefetch a partition or
    // two — the assertion allows slack but forbids all-16)
    val acc = spark.sparkContext.longAccumulator("parts_evaluated")
    val df = spark.range(0, 16000, 1, 16).mapPartitions { it =>
      acc.add(1); it
    }.toDF("v")
    engine.registerView("reader_wide", df)
    val r = engine.executeReader(sql"SELECT v FROM reader_wide")
    var n = 0
    while (n < 5 && r.read()) n += 1
    assert(n == 5)
    assert(acc.value < 16,
      s"all 16 partitions evaluated — reader materialized the full result (acc=${acc.value})")
  }
}
