package graft

import graft.params.SqlStatement
import org.apache.spark.sql.functions._

/** Column-evolution SQL surface — `ALTER TABLE … DROP COLUMN` and
  * `RENAME COLUMN` (Trino Iceberg column verbs,
  * trino.io/docs/current/connector/iceberg.html) — composed with the
  * snapshot-pinned-schema time-travel rule: evolution is metadata-only,
  * a pre-evolution snapshot presents the schema AS OF that snapshot.
  */
class SqlEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine(name: String): GraftEngine = {
    val e = new GraftEngine(spark, tmpDir(name))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.t (id bigint, name varchar, qty bigint)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)"))
    e
  }

  test("DROP COLUMN removes it from current reads; pre-drop snapshots still present it") {
    val e = freshEngine("evo-drop")
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.t DROP COLUMN qty"))
    assert(e.query(SqlStatement("SELECT * FROM demo.t"))
      .schema.fieldNames.toSeq == Seq("id", "name"))
    // metadata-only: no new snapshot, no data rewritten
    assert(e.catalog.snapshots("demo", "t").map(_.snapshotId) == Seq(1L))
    // the pre-drop snapshot pinned the 3-column schema WITH values
    val old = e.query(SqlStatement("SELECT * FROM demo.t FOR VERSION AS OF 1"))
    assert(old.schema.fieldNames.toSeq == Seq("id", "name", "qty"))
    assert(old.filter($"id" === 2).select($"qty").as[Long].head() == 20L)
    // inserts after the drop use the narrowed schema
    e.executeNonQuery(SqlStatement("INSERT INTO demo.t VALUES (4, 'd')"))
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.t")).as[Long].head() == 4L)
    // DESCRIBE follows the declared schema
    val desc = e.query(SqlStatement("DESCRIBE demo.t"))
      .collect().map(_.getString(0)).toSeq
    assert(!desc.contains("qty"))
  }

  test("DROP COLUMN guards: IF EXISTS no-op, missing is error, partition and last column refuse") {
    val e = freshEngine("evo-drop-guards")
    e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.t DROP COLUMN IF EXISTS nope")) // no-op
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("ALTER TABLE demo.t DROP COLUMN nope"))
    }
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.p (id bigint, part varchar) WITH (partitioning = ARRAY['part'])"))
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("ALTER TABLE demo.p DROP COLUMN part"))
    }
    assert(ex.getMessage.toLowerCase.contains("partition"))
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.one (only_col bigint)"))
    val ex2 = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("ALTER TABLE demo.one DROP COLUMN only_col"))
    }
    assert(ex2.getMessage.toLowerCase.contains("only column"))
  }

  test("RENAME COLUMN: new name in current reads, old files NULL-fill, history keeps old name") {
    val e = freshEngine("evo-rename")
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.t RENAME COLUMN qty TO amount"))
    assert(e.query(SqlStatement("SELECT * FROM demo.t"))
      .schema.fieldNames.toSeq == Seq("id", "name", "amount"))
    // name-based schema-on-read: pre-rename files NULL-fill the new name
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM demo.t WHERE amount IS NULL")).as[Long].head() == 3L)
    // new inserts carry values under the new name
    e.executeNonQuery(SqlStatement("INSERT INTO demo.t VALUES (4, 'd', 40)"))
    assert(e.query(SqlStatement(
      "SELECT amount FROM demo.t WHERE id = 4")).as[Long].head() == 40L)
    // time travel to the pre-rename snapshot: old name, old values
    val old = e.query(SqlStatement("SELECT * FROM demo.t FOR VERSION AS OF 1"))
    assert(old.schema.fieldNames.toSeq == Seq("id", "name", "qty"))
    assert(old.filter($"id" === 1).select($"qty").as[Long].head() == 10L)
  }

  test("RENAME COLUMN guards: IF EXISTS, missing source, existing target, partition column") {
    val e = freshEngine("evo-rename-guards")
    e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.t RENAME COLUMN IF EXISTS nope TO whatever")) // no-op
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("ALTER TABLE demo.t RENAME COLUMN nope TO x"))
    }
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("ALTER TABLE demo.t RENAME COLUMN qty TO name"))
    }
    assert(ex.getMessage.contains("already exists"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.p (id bigint, part varchar) WITH (partitioning = ARRAY['part'])"))
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("ALTER TABLE demo.p RENAME COLUMN part TO region"))
    }
  }

  test("evolution composes: add → insert → rename → drop → time travel each era") {
    val e = freshEngine("evo-compose")
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.t ADD COLUMN score bigint"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.t VALUES (4, 'd', 40, 7)")) // snap 2
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.t RENAME COLUMN score TO rating"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.t VALUES (5, 'e', 50, 9)")) // snap 3
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.t DROP COLUMN name"))
    // current: id, qty, rating; rating carries only post-rename values
    val cur = e.query(SqlStatement("SELECT * FROM demo.t"))
    assert(cur.schema.fieldNames.toSeq == Seq("id", "qty", "rating"))
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM demo.t WHERE rating IS NOT NULL")).as[Long].head() == 1L)
    // era 2 pinned (id, name, qty, score): score=7 visible for id=4
    val v2 = e.query(SqlStatement("SELECT * FROM demo.t FOR VERSION AS OF 2"))
    assert(v2.schema.fieldNames.toSeq == Seq("id", "name", "qty", "score"))
    assert(v2.filter($"id" === 4).select($"score").as[Long].head() == 7L)
    // era 3 pinned (id, name, qty, rating)
    val v3 = e.query(SqlStatement("SELECT * FROM demo.t FOR VERSION AS OF 3"))
    assert(v3.schema.fieldNames.toSeq == Seq("id", "name", "qty", "rating"))
    assert(v3.filter($"id" === 5).select($"rating").as[Long].head() == 9L)
    // SHOW CREATE TABLE reflects the final declared schema
    val ddl = e.query(SqlStatement("SHOW CREATE TABLE demo.t")).as[String].head()
    assert(ddl.contains("rating") && !ddl.contains("name") && !ddl.contains("score"))
  }

  test("SET DATA TYPE widens int->bigint; old files read widened; time travel pins the old type") {
    val e = new GraftEngine(spark, tmpDir("evo-widen"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.w (id integer, price real, amt decimal(10,2))"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.w VALUES (1, 1.5, 12.34), (2, 2.5, 56.78)"))
    e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.w ALTER COLUMN id SET DATA TYPE bigint"))
    e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.w ALTER COLUMN price SET DATA TYPE double"))
    e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.w ALTER COLUMN amt SET DATA TYPE decimal(20,2)"))
    // metadata-only: still one snapshot
    assert(e.catalog.snapshots("demo", "w").map(_.snapshotId) == Seq(1L))
    // current reads present the widened types over the ORIGINAL files
    val cur = e.query(SqlStatement("SELECT * FROM demo.w ORDER BY id"))
    assert(cur.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(cur.schema("price").dataType == org.apache.spark.sql.types.DoubleType)
    assert(cur.schema("amt").dataType == org.apache.spark.sql.types.DecimalType(20, 2))
    assert(cur.select($"id").as[Long].collect().toSeq == Seq(1L, 2L))
    // a post-promotion insert exercises values only a bigint holds
    e.executeNonQuery(SqlStatement(
      s"INSERT INTO demo.w VALUES (${Long.MaxValue}, 9.5, 1.00)"))
    assert(e.query(SqlStatement("SELECT max(id) AS m FROM demo.w"))
      .as[Long].head() == Long.MaxValue)
    // the pre-promotion snapshot pinned the narrow schema
    val v1 = e.query(SqlStatement("SELECT * FROM demo.w FOR VERSION AS OF 1"))
    assert(v1.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    // and DML composes with the widened schema
    assert(e.executeNonQuery(SqlStatement("DELETE FROM demo.w WHERE id = 1")) == 1L)
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.w")).as[Long].head() == 2L)
  }

  test("SET DATA TYPE rejects unsafe changes and transform sources") {
    val e = new GraftEngine(spark, tmpDir("evo-widen-guard"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.g (id integer, v varchar) WITH (partitioning = ARRAY['bucket(4, id)'])"))
    // narrowing / cross-class changes are rejected
    intercept[GraftQueryException](e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.g ALTER COLUMN v SET DATA TYPE bigint")))
    // a bucket-transform source would re-hash differently after promotion
    val ex = intercept[GraftQueryException](e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.g ALTER COLUMN id SET DATA TYPE bigint")))
    assert(ex.getMessage.contains("transform"))
  }

  test("DML after evolution: DELETE/UPDATE work on the narrowed schema") {
    val e = freshEngine("evo-dml")
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.t DROP COLUMN name"))
    assert(e.executeNonQuery(SqlStatement("DELETE FROM demo.t WHERE qty = 20")) == 1L)
    e.executeNonQuery(SqlStatement("UPDATE demo.t SET qty = qty + 1 WHERE id = 1"))
    val got = e.query(SqlStatement("SELECT id, qty FROM demo.t ORDER BY id"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 11L), (3L, 30L)))
  }

  test("CREATE OR REPLACE TABLE AS replaces content and schema in one commit; history survives") {
    val e = freshEngine("evo-replace")
    val n = e.executeNonQuery(SqlStatement(
      "CREATE OR REPLACE TABLE demo.t AS " +
        "SELECT id * 10 AS key, name AS label FROM demo.t WHERE id <= 2"))
    assert(n == 2L)
    // current read: new schema, new content
    val now = e.query(SqlStatement("SELECT key, label FROM demo.t ORDER BY key"))
      .as[(Long, String)].collect().toSeq
    assert(now == Seq((10L, "a"), (20L, "b")))
    // ONE new commit on the same log, operation 'replace'
    val snaps = e.catalog.snapshots("demo", "t")
    assert(snaps.map(_.snapshotId) == Seq(1L, 2L))
    assert(snaps.last.operation.contains("replace"))
    // the pre-replace snapshot is fully reachable with ITS schema
    val old = e.query(SqlStatement("SELECT * FROM demo.t FOR VERSION AS OF 1"))
    assert(old.schema.fieldNames.toSeq == Seq("id", "name", "qty"))
    assert(old.count() == 3L)
    // DML composes on the replaced table
    e.executeNonQuery(SqlStatement("DELETE FROM demo.t WHERE key = 10"))
    assert(e.queryScalar[Long](SqlStatement(
      "SELECT count(*) FROM demo.t")).contains(1L))
    // replacing a nonexistent table is a plain CTAS
    assert(e.executeNonQuery(SqlStatement(
      "CREATE OR REPLACE TABLE demo.u AS SELECT 1 AS x")) == 1L)
  }

  test("replacing a partitioned table keeps pre-replace snapshots readable with partition values") {
    val e = new GraftEngine(spark, tmpDir("evo-replace-part"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.p (id bigint, grp varchar) " +
        "WITH (partitioning = ARRAY['grp'])"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.p VALUES (1, 'a'), (2, 'b'), (3, 'a'), (4, 'b')"))
    // a pruned CoW delete decomposes carried entries to file granularity
    e.executeNonQuery(SqlStatement("DELETE FROM demo.p WHERE id = 3"))
    e.executeNonQuery(SqlStatement(
      "CREATE OR REPLACE TABLE demo.p AS SELECT count(*) AS n FROM demo.p"))
    assert(e.queryScalar[Long](SqlStatement("SELECT n FROM demo.p")).contains(3L))
    // both pre-replace snapshots: full rows WITH their partition values
    val v1 = e.query(SqlStatement(
      "SELECT id, grp FROM demo.p FOR VERSION AS OF 1 ORDER BY id"))
      .as[(Long, String)].collect().toSeq
    assert(v1 == Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "b")))
    val v2 = e.query(SqlStatement(
      "SELECT id, grp FROM demo.p FOR VERSION AS OF 2 ORDER BY id"))
      .as[(Long, String)].collect().toSeq
    assert(v2 == Seq((1L, "a"), (2L, "b"), (4L, "b")))
    // SELECT * over a pre-replace snapshot presents EXACTLY the pinned
    // schema — no leaked _snap / discovered partition columns, pinned
    // column order (Spark APPENDS discovered partition columns absent
    // from a user schema; the read must declare-then-drop them)
    assert(e.query(SqlStatement("SELECT * FROM demo.p FOR VERSION AS OF 2"))
      .schema.fieldNames.toSeq == Seq("id", "grp"))
  }

  test("a failing CREATE OR REPLACE leaves the table fully intact") {
    val e = new GraftEngine(spark, tmpDir("evo-replace-fail"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.p (id bigint, grp varchar) " +
        "WITH (partitioning = ARRAY['grp'])"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.p VALUES (1, 'a'), (2, 'not-a-number')"))
    // the replacement query fails at EXECUTION (ANSI cast on row 2) —
    // after the failure the table must read exactly as before, with its
    // schema, partition spec, and snapshot count untouched
    intercept[Exception] {
      e.executeNonQuery(SqlStatement(
        "CREATE OR REPLACE TABLE demo.p AS SELECT CAST(grp AS BIGINT) AS g FROM demo.p"))
    }
    assert(e.catalog.partitionSpec("demo", "p") == Seq("grp"))
    assert(e.catalog.snapshots("demo", "p").map(_.snapshotId) == Seq(1L))
    val rows = e.query(SqlStatement("SELECT * FROM demo.p ORDER BY id"))
    assert(rows.schema.fieldNames.toSeq == Seq("id", "grp"))
    assert(rows.as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "not-a-number")))
  }
}
