package graft

import graft.params.SqlStatement

/** Catalog views + introspection: CREATE [OR REPLACE] VIEW / DROP VIEW
  * with run-time expansion (Trino's non-materialized view semantics),
  * SHOW SCHEMAS / SHOW TABLES / DESCRIBE, and the Trino CALL spelling of
  * rollback_to_snapshot.
  */
class SqlViewsSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine(name: String): GraftEngine = {
    val e = new GraftEngine(spark, tmpDir(name))
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.base (id bigint, v varchar)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.base VALUES (1, 'a'), (2, 'b'), (3, 'c')"))
    e
  }

  test("CREATE VIEW persists SQL text; SELECT expands against CURRENT table state") {
    val e = freshEngine("views-basic")
    e.executeNonQuery(SqlStatement(
      "CREATE VIEW demo.big AS SELECT id, v FROM demo.base WHERE id >= 2"))
    assert(e.query(SqlStatement("SELECT id FROM demo.big"))
      .as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // a later INSERT is visible through the view — run-time expansion,
    // not a materialization at CREATE time
    e.executeNonQuery(SqlStatement("INSERT INTO demo.base VALUES (9, 'z')"))
    assert(e.query(SqlStatement("SELECT id FROM demo.big"))
      .as[Long].collect().sorted.toSeq == Seq(2L, 3L, 9L))
  }

  test("views compose: a view over a view, joined back to the base table") {
    val e = freshEngine("views-nested")
    e.executeNonQuery(SqlStatement(
      "CREATE VIEW demo.v1 AS SELECT id, v FROM demo.base WHERE id >= 2"))
    e.executeNonQuery(SqlStatement(
      "CREATE VIEW demo.v2 AS SELECT id FROM demo.v1 WHERE id >= 3"))
    val got = e.query(SqlStatement(
      "SELECT b.v FROM demo.base b JOIN demo.v2 w ON b.id = w.id")).as[String].collect()
    assert(got.toSeq == Seq("c"))
  }

  test("CREATE VIEW validates the defining query; OR REPLACE swaps the definition") {
    val e = freshEngine("views-replace")
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        "CREATE VIEW demo.bad AS SELECT nope FROM demo.base"))
    }
    e.executeNonQuery(SqlStatement(
      "CREATE VIEW demo.w AS SELECT id FROM demo.base"))
    intercept[GraftQueryException] { // duplicate without OR REPLACE
      e.executeNonQuery(SqlStatement(
        "CREATE VIEW demo.w AS SELECT id FROM demo.base"))
    }
    e.executeNonQuery(SqlStatement(
      "CREATE OR REPLACE VIEW demo.w AS SELECT id FROM demo.base WHERE id = 1"))
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.w")).as[Long].head() == 1L)
  }

  test("DROP VIEW removes the view; IF EXISTS is a no-op on a missing one") {
    val e = freshEngine("views-drop")
    e.executeNonQuery(SqlStatement("CREATE VIEW demo.w AS SELECT id FROM demo.base"))
    e.executeNonQuery(SqlStatement("DROP VIEW demo.w"))
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("DROP VIEW demo.w"))
    }
    assert(e.executeNonQuery(SqlStatement("DROP VIEW IF EXISTS demo.w")) == 0L)
  }

  test("a view definition cycle fails with the depth error, not a stack overflow") {
    val e = freshEngine("views-cycle")
    // self-reference sneaks past CREATE validation only via OR REPLACE
    // (at first-create time the name does not resolve yet)
    e.executeNonQuery(SqlStatement(
      "CREATE VIEW demo.cyc AS SELECT id FROM demo.base"))
    e.executeNonQuery(SqlStatement(
      "CREATE OR REPLACE VIEW demo.cyc AS SELECT id FROM demo.cyc WHERE id > 0"))
    val ex = intercept[GraftQueryException] {
      e.query(SqlStatement("SELECT * FROM demo.cyc")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("cycle"))
  }

  test("SHOW SCHEMAS / SHOW TABLES list catalog state; views appear in SHOW TABLES") {
    val e = freshEngine("views-show")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA extra"))
    e.executeNonQuery(SqlStatement("CREATE VIEW demo.w AS SELECT id FROM demo.base"))
    val schemas = e.query(SqlStatement("SHOW SCHEMAS")).as[String].collect().toSeq
    assert(schemas.contains("demo") && schemas.contains("extra"))
    val tables = e.query(SqlStatement("SHOW TABLES FROM demo")).as[String].collect().toSeq
    assert(tables == Seq("base", "w"))
  }

  test("DESCRIBE reports columns for tables and for views") {
    val e = freshEngine("views-describe")
    e.executeNonQuery(SqlStatement(
      "CREATE VIEW demo.w AS SELECT id, length(v) AS len FROM demo.base"))
    val t = e.query(SqlStatement("DESCRIBE demo.base"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(t == Seq(("id", "bigint"), ("v", "string")))
    val w = e.query(SqlStatement("DESC demo.w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(w == Seq(("id", "bigint"), ("len", "int")))
    intercept[GraftQueryException] {
      e.query(SqlStatement("DESCRIBE demo.nope"))
    }
  }

  test("CALL system.rollback_to_snapshot — positional and named Trino spellings") {
    val e = freshEngine("views-call")
    e.executeNonQuery(SqlStatement("DELETE FROM demo.base WHERE id >= 2"))
    e.executeNonQuery(SqlStatement(
      "CALL system.rollback_to_snapshot('demo', 'base', 1)"))
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.base")).as[Long].head() == 3L)
    e.executeNonQuery(SqlStatement("DELETE FROM demo.base WHERE id = 1"))
    e.executeNonQuery(SqlStatement(
      "CALL iceberg.system.rollback_to_snapshot(schema_name => 'demo', table_name => 'base', snapshot_id => 1)"))
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.base")).as[Long].head() == 3L)
  }

  test("SHOW CREATE TABLE reconstructs the DDL; SHOW COLUMNS aliases DESCRIBE") {
    val e = freshEngine("views-showcreate")
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.pt (id bigint, d varchar, x decimal(10,2)) WITH (partitioning = ARRAY['d'])"))
    val ddl = e.query(SqlStatement("SHOW CREATE TABLE demo.pt")).as[String].head()
    assert(ddl ==
      """CREATE TABLE demo.pt (
        |   id bigint,
        |   d varchar,
        |   x decimal(10, 2)
        |)
        |WITH (
        |   format = 'PARQUET',
        |   partitioning = ARRAY['d']
        |)""".stripMargin)
    // the reconstructed DDL round-trips through the parser
    e.executeNonQuery(SqlStatement("DROP TABLE demo.pt"))
    e.executeNonQuery(SqlStatement(ddl))
    assert(e.catalog.partitionSpec("demo", "pt") == Seq("d"))

    val cols = e.query(SqlStatement("SHOW COLUMNS FROM demo.base"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cols == Seq(("id", "bigint"), ("v", "string")))
  }

  test("SHOW CREATE VIEW returns the persisted definition") {
    val e = freshEngine("views-showcreateview")
    e.executeNonQuery(SqlStatement(
      "CREATE VIEW demo.w AS SELECT id FROM demo.base WHERE id > 1"))
    val v = e.query(SqlStatement("SHOW CREATE VIEW demo.w")).as[String].head()
    assert(v == "CREATE VIEW demo.w AS SELECT id FROM demo.base WHERE id > 1")
    intercept[GraftQueryException] {
      e.query(SqlStatement("SHOW CREATE VIEW demo.nope"))
    }
  }

  test("CREATE VIEW name colliding with a table is rejected") {
    val e = freshEngine("views-collide")
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        "CREATE VIEW demo.base AS SELECT id FROM demo.base"))
    }
  }
}
