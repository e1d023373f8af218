package graft

import graft.params.SqlStatement
import org.apache.spark.sql.functions._

/** Materialized views (Trino Iceberg CREATE MATERIALIZED VIEW +
  * REFRESH): the definition's result persists as a snapshot table; reads
  * serve the MATERIALIZED state even when sources have moved on;
  * REFRESH re-runs the definition as a replace commit; DESCRIBE
  * surfaces freshness; history stays time-travel-visible.
  */
class SqlMaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine(name: String): GraftEngine = {
    val e = new GraftEngine(spark, tmpDir(name))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.src (id bigint, grp varchar, v bigint)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 30)"))
    e
  }

  test("stale reads return materialized state; refresh catches up") {
    val e = freshEngine("mv-basic")
    e.executeNonQuery(SqlStatement(
      """CREATE MATERIALIZED VIEW demo.mv AS
        |SELECT grp, count(*) AS n, sum(v) AS total FROM demo.src GROUP BY grp""".stripMargin))
    def mvState() = e.query(SqlStatement(
      "SELECT grp, n, total FROM demo.mv ORDER BY grp"))
      .as[(String, Long, Long)].collect().toSeq
    assert(mvState() === Seq(("a", 2L, 30L), ("b", 1L, 30L)))
    // source advances → the MV still serves the MATERIALIZED state
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (4, 'b', 40)"))
    assert(mvState() === Seq(("a", 2L, 30L), ("b", 1L, 30L)))
    assert(e.catalog.staleSources("demo", "mv") === Seq("demo.src"))
    // refresh re-runs the definition (returns the refreshed row count)
    assert(e.executeNonQuery(SqlStatement(
      "REFRESH MATERIALIZED VIEW demo.mv")) === 2L)
    assert(mvState() === Seq(("a", 2L, 30L), ("b", 2L, 70L)))
    assert(e.catalog.staleSources("demo", "mv").isEmpty)
  }

  test("DESCRIBE surfaces freshness; time travel composes with refresh history") {
    val e = freshEngine("mv-describe")
    e.executeNonQuery(SqlStatement(
      "CREATE MATERIALIZED VIEW demo.mv AS SELECT count(*) AS n FROM demo.src"))
    def freshness() = e.query(SqlStatement("DESCRIBE demo.mv"))
      .filter($"column_name" === "# materialized_view")
      .select("data_type").as[String].head()
    assert(freshness() === "fresh")
    e.executeNonQuery(SqlStatement("DELETE FROM demo.src WHERE id = 1"))
    assert(freshness() === "stale")
    val comment = e.query(SqlStatement("DESCRIBE demo.mv"))
      .filter($"column_name" === "# materialized_view")
      .select("comment").as[String].head()
    assert(comment.contains("demo.src"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mv"))
    assert(freshness() === "fresh")
    // the pre-refresh materialization is still time-travel-visible
    assert(e.query(SqlStatement(
      "SELECT n FROM demo.mv FOR VERSION AS OF 1")).as[Long].head() === 3L)
    assert(e.query(SqlStatement("SELECT n FROM demo.mv")).as[Long].head() === 2L)
    // shape-admitted refresh strategy surfaces as a second metadata row
    def strategy(mv: String) = e.query(SqlStatement(s"DESCRIBE demo.$mv"))
      .filter($"column_name" === "# refresh_strategy")
      .select("data_type").as[String].head()
    assert(strategy("mv") === "incremental-merge") // global count(*)
    e.executeNonQuery(SqlStatement(
      "CREATE MATERIALIZED VIEW demo.mv_p AS SELECT id FROM demo.src WHERE id > 1"))
    assert(strategy("mv_p") === "incremental-append")
    // avg now classifies (hidden sum/count partials, round 11)
    e.executeNonQuery(SqlStatement(
      "CREATE MATERIALIZED VIEW demo.mv_a AS SELECT avg(id) AS a FROM demo.src"))
    assert(strategy("mv_a") === "incremental-merge")
    e.executeNonQuery(SqlStatement(
      "CREATE MATERIALIZED VIEW demo.mv_f AS SELECT DISTINCT id FROM demo.src"))
    assert(strategy("mv_f") === "full-recompute")
  }

  test("lifecycle guards: duplicate create, IF NOT EXISTS, drop, refresh of non-MV") {
    val e = freshEngine("mv-guards")
    e.executeNonQuery(SqlStatement(
      "CREATE MATERIALIZED VIEW demo.mv AS SELECT id FROM demo.src"))
    intercept[GraftQueryException](e.executeNonQuery(SqlStatement(
      "CREATE MATERIALIZED VIEW demo.mv AS SELECT id FROM demo.src")))
    assert(e.executeNonQuery(SqlStatement(
      "CREATE MATERIALIZED VIEW IF NOT EXISTS demo.mv AS SELECT id FROM demo.src")) === 0L)
    intercept[GraftQueryException](e.executeNonQuery(SqlStatement(
      "REFRESH MATERIALIZED VIEW demo.nope")))
    e.executeNonQuery(SqlStatement("DROP MATERIALIZED VIEW demo.mv"))
    assert(!e.catalog.tableExists("demo", "mv"))
    assert(e.executeNonQuery(SqlStatement(
      "DROP MATERIALIZED VIEW IF EXISTS demo.mv")) === 0L)
    intercept[GraftQueryException](e.executeNonQuery(SqlStatement(
      "DROP MATERIALIZED VIEW demo.mv")))
  }

  test("MV over a join records every source; any advancing source marks stale") {
    val e = freshEngine("mv-join")
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.dim (grp varchar, label varchar)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.dim VALUES ('a', 'alpha'), ('b', 'beta')"))
    e.executeNonQuery(SqlStatement(
      """CREATE MATERIALIZED VIEW demo.mvj AS
        |SELECT d.label, count(*) AS n FROM demo.src s
        |JOIN demo.dim d ON s.grp = d.grp GROUP BY d.label""".stripMargin))
    assert(e.catalog.materializedViewMeta("demo", "mvj").get._2.keySet ===
      Set("demo.src", "demo.dim"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES ('c', 'gamma')"))
    assert(e.catalog.staleSources("demo", "mvj") === Seq("demo.dim"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvj"))
    assert(e.catalog.staleSources("demo", "mvj").isEmpty)
  }
}
