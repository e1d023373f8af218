package graft

import graft.params.SqlStatement

/** Session default schema + USE (reference ClientSessionProperties
  * { Catalog, Schema }, AthenaClient.cs:37-45: the session carries a
  * default namespace so unqualified names resolve on every statement).
  */
class SqlUseSchemaSpec extends SparkSpec {

  private def freshEngine(name: String): GraftEngine = {
    val e = new GraftEngine(spark, tmpDir(name))
    e.executeNonQuery(SqlStatement("CREATE SCHEMA sales"))
    e.executeNonQuery(SqlStatement("CREATE TABLE sales.orders_t (id bigint, v varchar)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO sales.orders_t VALUES (1, 'a'), (2, 'b'), (3, 'c')"))
    e
  }

  test("USE sets the session schema; unqualified SELECT resolves against it") {
    val e = freshEngine("use-select")
    assert(e.currentSchema == "default")
    // before USE, the bare name does not resolve in the catalog
    intercept[GraftQueryException] {
      e.query(SqlStatement("SELECT id FROM orders_t ORDER BY id")).collect()
    }
    e.executeNonQuery(SqlStatement("USE sales"))
    assert(e.currentSchema == "sales")
    val got = e.query(SqlStatement("SELECT id, v FROM orders_t ORDER BY id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // a catalog qualifier is accepted and dropped (USE iceberg.sales)
    e.executeNonQuery(SqlStatement("USE iceberg.sales"))
    assert(e.currentSchema == "sales")
  }

  test("USE of a missing schema is a typed error") {
    val e = freshEngine("use-missing")
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("USE nope"))
    }
    assert(e.currentSchema == "default")
  }

  test("unqualified DML + DDL resolve against the session schema") {
    val e = freshEngine("use-dml")
    e.executeNonQuery(SqlStatement("USE sales"))
    // INSERT / UPDATE / DELETE with bare names
    assert(e.executeNonQuery(SqlStatement(
      "INSERT INTO orders_t VALUES (4, 'd')")) == 1L)
    assert(e.executeNonQuery(SqlStatement(
      "UPDATE orders_t SET v = 'B' WHERE id = 2")) == 1L)
    assert(e.executeNonQuery(SqlStatement(
      "DELETE FROM orders_t WHERE id = 1")) == 1L)
    val got = e.query(SqlStatement("SELECT id, v FROM orders_t ORDER BY id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "B"), (3L, "c"), (4L, "d")))
    // bare CTAS + DROP TABLE land in the session schema
    e.executeNonQuery(SqlStatement("CREATE TABLE copy_t AS SELECT * FROM orders_t"))
    assert(e.catalog.tableExists("sales", "copy_t"))
    e.executeNonQuery(SqlStatement("DROP TABLE copy_t"))
    assert(!e.catalog.tableExists("sales", "copy_t"))
  }

  test("introspection honors the session schema (SHOW TABLES / DESCRIBE / SHOW STATS)") {
    val e = freshEngine("use-introspect")
    e.executeNonQuery(SqlStatement("USE sales"))
    val tables = e.query(SqlStatement("SHOW TABLES"))
      .collect().map(_.getString(0)).toSeq
    assert(tables == Seq("orders_t"))
    val cols = e.query(SqlStatement("DESCRIBE orders_t"))
      .collect().map(_.getString(0)).toSeq
    assert(cols == Seq("id", "v"))
    assert(e.query(SqlStatement("SHOW STATS FOR orders_t")).count() == 3L) // 2 cols + summary
    assert(e.query(SqlStatement("SHOW CREATE TABLE orders_t"))
      .collect()(0).getString(0).contains("CREATE TABLE sales.orders_t"))
  }

  test("bare names the catalog doesn't own pass through (temp views keep working)") {
    val e = freshEngine("use-passthrough")
    e.executeNonQuery(SqlStatement("USE sales"))
    import spark.implicits._
    Seq((10L, "x")).toDF("id", "v").createOrReplaceTempView("plain_view")
    val got = e.query(SqlStatement("SELECT id FROM plain_view")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(10L))
    // DESCRIBE of a Spark temp view still falls through to Spark
    assert(e.query(SqlStatement("DESCRIBE plain_view")).count() >= 2L)
  }

  test("unqualified time travel resolves against the session schema") {
    val e = freshEngine("use-tt")
    e.executeNonQuery(SqlStatement("USE sales"))
    e.executeNonQuery(SqlStatement("INSERT INTO orders_t VALUES (9, 'z')"))
    // snapshot 1 (the first INSERT) has 3 rows; current has 4
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM orders_t FOR VERSION AS OF 1")).collect()(0).getLong(0) == 3L)
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM orders_t")).collect()(0).getLong(0) == 4L)
  }

  test("bare rewrite edge cases: literals untouched, VALUES/table functions pass through") {
    val e = freshEngine("use-edges")
    e.executeNonQuery(SqlStatement("USE sales"))
    // a bare table name INSIDE a string literal is not rewritten
    val lit = e.query(SqlStatement(
      "SELECT 'FROM orders_t' AS s FROM orders_t WHERE id = 1")).collect()
    assert(lit.map(_.getString(0)).toSeq == Seq("FROM orders_t"))
    // FROM VALUES and table functions don't trip the bare-name rewrite
    assert(e.query(SqlStatement(
      "SELECT * FROM VALUES (1), (2) AS t(x)")).count() == 2L)
    assert(e.query(SqlStatement(
      "SELECT * FROM range(3)")).count() == 3L)
  }

  test("unqualified metadata table resolves against the session schema") {
    val e = freshEngine("use-meta")
    e.executeNonQuery(SqlStatement("USE sales"))
    e.executeNonQuery(SqlStatement("INSERT INTO orders_t VALUES (9, 'z')"))
    val ops = e.query(SqlStatement(
      "SELECT snapshot_id, operation FROM \"orders_t$snapshots\" ORDER BY snapshot_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ops == Seq((1L, "append"), (2L, "append")))
    // the unquoted bare spelling works too
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM orders_t$history")).collect()(0).getLong(0) == 2L)
  }

  test("DROP SCHEMA: a name ending in 'cascade' is not parsed as CASCADE mode") {
    val e = freshEngine("use-dropschema")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA foo_cascade"))
    e.executeNonQuery(SqlStatement("CREATE TABLE foo_cascade.t1 (id bigint)"))
    // DROP SCHEMA foo_cascade must target foo_cascade in RESTRICT mode —
    // non-empty, so it must refuse (not drop some schema `foo_` with CASCADE)
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("DROP SCHEMA foo_cascade"))
    }
    assert(e.catalog.schemaExists("foo_cascade"))
    e.executeNonQuery(SqlStatement("DROP SCHEMA foo_cascade CASCADE"))
    assert(!e.catalog.schemaExists("foo_cascade"))
  }
}
