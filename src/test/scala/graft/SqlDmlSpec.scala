package graft

import graft.params.SqlStatement
import org.apache.spark.sql.types._

/** SQL-text DML surface: UPDATE / DELETE / ALTER TABLE EXECUTE routed
  * through executeNonQuery onto the snapshot catalog's copy-on-write
  * rewrites (Trino Iceberg DML semantics: affected-row counts, 3VL
  * predicates, simultaneous assignment, maintenance procedures).
  */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine(name: String): GraftEngine = {
    val e = new GraftEngine(spark, tmpDir(name))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.t (id bigint, name varchar, qty bigint)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30), (4, NULL, 40)"))
    e
  }

  test("TRUNCATE TABLE empties the table, reports the count, keeps history") {
    val e = freshEngine("dml-truncate")
    val n = e.executeNonQuery(SqlStatement("TRUNCATE TABLE demo.t"))
    assert(n == 4L)
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.t")).as[Long].head() == 0L)
    // pre-truncate snapshot still time-travel-visible
    val snaps = e.catalog.snapshots("demo", "t")
    assert(e.catalog.readAsOf("demo", "t", snaps.head.committedAtMillis).count() == 4L)
  }

  test("DROP SCHEMA: RESTRICT refuses a non-empty schema, CASCADE drops everything") {
    val e = freshEngine("dml-dropschema")
    e.executeNonQuery(SqlStatement("CREATE VIEW demo.v AS SELECT id FROM demo.t"))
    intercept[GraftQueryException] { // RESTRICT default: table + view exist
      e.executeNonQuery(SqlStatement("DROP SCHEMA demo"))
    }
    assert(e.catalog.schemaExists("demo"))
    e.executeNonQuery(SqlStatement("DROP SCHEMA demo CASCADE"))
    assert(!e.catalog.schemaExists("demo"))
    assert(!e.catalog.tableExists("demo", "t"))
    intercept[GraftQueryException] { // now gone
      e.executeNonQuery(SqlStatement("DROP SCHEMA demo"))
    }
    assert(e.executeNonQuery(SqlStatement("DROP SCHEMA IF EXISTS demo")) == 0L)
    // an empty schema drops without CASCADE
    e.executeNonQuery(SqlStatement("CREATE SCHEMA empty_s"))
    assert(e.executeNonQuery(SqlStatement("DROP SCHEMA empty_s RESTRICT")) == 0L)
    assert(!e.catalog.schemaExists("empty_s"))
  }

  test("DELETE FROM with WHERE returns the deleted count and commits a snapshot") {
    val e = freshEngine("dml-del")
    val n = e.executeNonQuery(SqlStatement("DELETE FROM demo.t WHERE qty >= 30"))
    assert(n == 2L)
    assert(e.query(SqlStatement("SELECT id FROM demo.t")).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
    // the delete committed a rewrite snapshot on top of the insert's
    assert(e.catalog.snapshots("demo", "t").size == 2)
  }

  test("DELETE without WHERE empties the table (count = all rows)") {
    val e = freshEngine("dml-del-all")
    assert(e.executeNonQuery(SqlStatement("DELETE FROM demo.t")) == 4L)
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.t")).as[Long].head() == 0L)
  }

  test("DELETE 3VL: a NULL-valued predicate keeps the row (only TRUE deletes)") {
    val e = freshEngine("dml-del-3vl")
    // name = 'a' is NULL for the NULL-name row -> that row survives
    val n = e.executeNonQuery(SqlStatement("DELETE FROM demo.t WHERE name <> 'zzz'"))
    assert(n == 3L)
    assert(e.query(SqlStatement("SELECT id FROM demo.t")).as[Long].collect().toSeq == Seq(4L))
  }

  test("UPDATE applies SET to TRUE-predicate rows only and returns the count") {
    val e = freshEngine("dml-upd")
    val n = e.executeNonQuery(SqlStatement(
      "UPDATE demo.t SET qty = qty * 2, name = concat(name, '!') WHERE id <= 2"))
    assert(n == 2L)
    val rows = e.query(SqlStatement("SELECT id, name, qty FROM demo.t ORDER BY id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a!", 20L), (2L, "b!", 40L), (3L, "c", 30L), (4L, null, 40L)))
  }

  test("UPDATE simultaneous assignment: SET a = b, b = a swaps (pre-update values)") {
    val e = new GraftEngine(spark, tmpDir("dml-swap"))
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.s (a bigint, b bigint)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.s VALUES (1, 100)"))
    e.executeNonQuery(SqlStatement("UPDATE demo.s SET a = b, b = a"))
    val r = e.query(SqlStatement("SELECT a, b FROM demo.s")).head()
    assert((r.getLong(0), r.getLong(1)) == ((100L, 1L)))
  }

  test("UPDATE casts assigned expressions to the column type (schema stable)") {
    val e = freshEngine("dml-cast")
    e.executeNonQuery(SqlStatement("UPDATE demo.t SET qty = 1.9 WHERE id = 1"))
    val df = e.query(SqlStatement("SELECT qty FROM demo.t WHERE id = 1"))
    assert(df.schema.head.dataType == LongType)
    assert(df.as[Long].head() == 1L) // double 1.9 -> bigint truncates toward zero
  }

  test("UPDATE quote-aware parsing: comma and WHERE inside string literals") {
    val e = freshEngine("dml-quote")
    val n = e.executeNonQuery(SqlStatement(
      "UPDATE demo.t SET name = 'x,WHERE y' WHERE id = 2"))
    assert(n == 1L)
    assert(e.query(SqlStatement("SELECT name FROM demo.t WHERE id = 2"))
      .as[String].head() == "x,WHERE y")
  }

  test("UPDATE 3VL: NULL predicate rows pass through unchanged") {
    val e = freshEngine("dml-upd-3vl")
    val n = e.executeNonQuery(SqlStatement(
      "UPDATE demo.t SET qty = 0 WHERE name <> 'a'"))
    assert(n == 2L) // b, c; the NULL-name row's predicate is NULL
    assert(e.query(SqlStatement("SELECT qty FROM demo.t WHERE id = 4")).as[Long].head() == 40L)
  }

  test("UPDATE unknown column / malformed expression raise the typed error") {
    val e = freshEngine("dml-upd-err")
    val ex1 = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("UPDATE demo.t SET nope = 1"))
    }
    assert(ex1.getMessage.contains("nope"))
    val ex2 = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("UPDATE demo.t SET qty = )bad("))
    }
    assert(ex2.getMessage.toLowerCase.contains("malformed"))
  }

  test("ALTER TABLE ADD COLUMN: SQL spelling of additive schema evolution") {
    val e = freshEngine("dml-addcol")
    e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.t ADD COLUMN score decimal(10,2)"))
    val desc = e.query(SqlStatement("DESCRIBE demo.t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("score") == "decimal(10,2)")
    // existing rows read NULL for the new column; inserts can fill it
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM demo.t WHERE score IS NULL")).as[Long].head() == 4L)
    e.executeNonQuery(SqlStatement("INSERT INTO demo.t VALUES (5, 'e', 50, 9.25)"))
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM demo.t WHERE score IS NOT NULL")).as[Long].head() == 1L)
    // duplicate: IF NOT EXISTS no-ops, plain spelling is the typed error
    e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.t ADD COLUMN IF NOT EXISTS score decimal(10,2)"))
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("ALTER TABLE demo.t ADD COLUMN score bigint"))
    }
  }

  test("ALTER TABLE RENAME TO moves the table with history; SHOW CATALOGS lists") {
    val e = freshEngine("dml-rename")
    e.executeNonQuery(SqlStatement("UPDATE demo.t SET qty = 99 WHERE id = 1"))
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.t RENAME TO t_renamed"))
    assert(!e.catalog.tableExists("demo", "t"))
    assert(e.catalog.tableExists("demo", "t_renamed"))
    // data, snapshots, and time travel all travel with the rename
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM demo.t_renamed")).as[Long].head() == 4L)
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM demo.t_renamed FOR VERSION AS OF 1")).as[Long].head() == 4L)
    assert(e.catalog.snapshots("demo", "t_renamed").map(_.operation.get) ==
      Seq("append", "overwrite"))
    // cross-schema rename
    e.executeNonQuery(SqlStatement("CREATE SCHEMA demo2"))
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.t_renamed RENAME TO demo2.t2"))
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM demo2.t2")).as[Long].head() == 4L)
    // target collision is a typed error
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.other (id bigint)"))
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("ALTER TABLE demo2.t2 RENAME TO demo.other"))
    }
    val cats = e.query(SqlStatement("SHOW CATALOGS")).collect().map(_.getString(0))
    assert(cats.toSeq == Seq("iceberg"))
  }

  test("DML on a missing table raises the typed error") {
    val e = new GraftEngine(spark, tmpDir("dml-missing"))
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("DELETE FROM demo.ghost WHERE 1 = 1"))
    }
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("UPDATE demo.ghost SET x = 1"))
    }
  }

  test("time travel still reads the pre-DML snapshot after UPDATE + DELETE") {
    val e = freshEngine("dml-tt")
    val preDml = e.catalog.snapshots("demo", "t").last.committedAtMillis
    e.executeNonQuery(SqlStatement("UPDATE demo.t SET qty = 0 WHERE id = 1"))
    e.executeNonQuery(SqlStatement("DELETE FROM demo.t WHERE id >= 3"))
    assert(e.catalog.readAsOf("demo", "t", preDml).count() == 4L)
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.t")).as[Long].head() == 2L)
  }

  test("ALTER TABLE EXECUTE optimize compacts; expire_snapshots reclaims; remove_orphan_files runs") {
    val e = freshEngine("dml-maint")
    e.executeNonQuery(SqlStatement("INSERT INTO demo.t VALUES (5, 'e', 50)"))
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.t EXECUTE optimize"))
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.t")).as[Long].head() == 5L)
    // everything older than 0s ago expires except what the latest state needs
    val expired = e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.t EXECUTE expire_snapshots(retention_threshold => '0s')"))
    assert(expired >= 1L)
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.t")).as[Long].head() == 5L)
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.t EXECUTE remove_orphan_files"))
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.t")).as[Long].head() == 5L)
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("ALTER TABLE demo.t EXECUTE vacuum_everything"))
    }
    assert(ex.getMessage.contains("vacuum_everything"))
  }
}
