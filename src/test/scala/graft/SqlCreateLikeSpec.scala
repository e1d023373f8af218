package graft

import graft.params.SqlStatement
import org.apache.spark.sql.types._

/** `CREATE TABLE t (LIKE src [INCLUDING PROPERTIES])` — Trino's
  * shape-cloning DDL: columns always copy; INCLUDING PROPERTIES also
  * carries the physical contract (partitioning, sorted_by, blooms,
  * format_version, free-form properties); data and history never copy.
  */
class SqlCreateLikeSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine(name: String): GraftEngine = {
    val e = new GraftEngine(spark, tmpDir(name))
    e.executeNonQuery(SqlStatement("CREATE SCHEMA demo"))
    e.executeNonQuery(SqlStatement(
      """CREATE TABLE demo.src (id bigint, p varchar, v double)
        |WITH (partitioning = ARRAY['p'], sorted_by = ARRAY['id'],
        |      format_version = 2)""".stripMargin))
    e.catalog.setTableProperty("demo", "src",
      "history.expire.min-snapshots-to-keep", "3")
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (1, 'a', 1.5)"))
    e
  }

  test("LIKE copies columns only by default; table starts empty") {
    val e = freshEngine("like-basic")
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.t (LIKE demo.src)"))
    assert(e.catalog.declaredSchema("demo", "t").get.fieldNames.toSeq ==
      Seq("id", "p", "v"))
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.t"))
      .as[Long].head() == 0L, "LIKE clones a shape, never data")
    // EXCLUDING (the default): no layout carried
    assert(e.catalog.partitionSpec("demo", "t").isEmpty)
    assert(e.catalog.sortSpec("demo", "t").isEmpty)
    assert(e.catalog.formatVersion("demo", "t") == 1)
  }

  test("LIKE ... INCLUDING PROPERTIES carries the full physical contract") {
    val e = freshEngine("like-props")
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.t (LIKE demo.src INCLUDING PROPERTIES)"))
    assert(e.catalog.partitionSpec("demo", "t") == Seq("p"))
    assert(e.catalog.sortSpec("demo", "t") == Seq("id"))
    assert(e.catalog.formatVersion("demo", "t") == 2)
    assert(e.catalog.tableProperty("demo", "t",
      "history.expire.min-snapshots-to-keep").contains("3"))
    // the clone is a real independent table: writes land partitioned,
    // and the source is untouched
    e.executeNonQuery(SqlStatement("INSERT INTO demo.t VALUES (9, 'z', 0.5)"))
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.t"))
      .as[Long].head() == 1L)
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.src"))
      .as[Long].head() == 1L)
  }

  test("LIKE guards: missing source, existing target, IF NOT EXISTS no-op never mutates") {
    val e = freshEngine("like-guards")
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("CREATE TABLE demo.t (LIKE demo.nope)"))
    }
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.t (LIKE demo.src)"))
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("CREATE TABLE demo.t (LIKE demo.src)"))
    }
    // IF NOT EXISTS against the existing (EXCLUDING-shaped) clone must
    // not graft the source's properties onto it
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE IF NOT EXISTS demo.t (LIKE demo.src INCLUDING PROPERTIES)"))
    assert(e.catalog.partitionSpec("demo", "t").isEmpty,
      "IF NOT EXISTS no-op mutated the pre-existing table's layout")
    assert(e.catalog.tableProperty("demo", "t",
      "history.expire.min-snapshots-to-keep").isEmpty)
  }
}
