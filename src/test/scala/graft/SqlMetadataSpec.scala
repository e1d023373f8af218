package graft

import graft.params.SqlStatement

/** Metadata tables (`"t$snapshots"` / `"t$history"` / `"t$files"`) and
  * `rollback_to_snapshot` — the Trino Iceberg inspection + recovery
  * surface (https://trino.io/docs/current/connector/iceberg.html
  * metadata-tables section).
  */
class SqlMetadataSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine(name: String): GraftEngine = {
    val e = new GraftEngine(spark, tmpDir(name))
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.m (id bigint, v varchar)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.m VALUES (1, 'a'), (2, 'b')"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.m VALUES (3, 'c')"))
    e
  }

  test("t$snapshots lists every commit with parent chain and operation kind") {
    val e = freshEngine("meta-snaps")
    e.executeNonQuery(SqlStatement("DELETE FROM demo.m WHERE id = 1"))
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.m EXECUTE optimize"))
    val rows = e.query(SqlStatement(
      """SELECT snapshot_id, parent_id, operation FROM demo."m$snapshots" ORDER BY snapshot_id"""))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1L, -1L, "append"), (2L, 1L, "append"),
      (3L, 2L, "overwrite"), (4L, 3L, "replace")))
    // committed_at is a real timestamp column, strictly increasing
    val ts = e.query(SqlStatement(
      """SELECT committed_at FROM demo."m$snapshots" ORDER BY snapshot_id"""))
      .collect().map(_.getTimestamp(0).getTime)
    assert(ts.sliding(2).forall(p => p(0) < p(1)))
  }

  test("t$metadata_log_entries lists commit-log files with latest snapshot ids") {
    val e = freshEngine("meta-log")
    val rows = e.query(SqlStatement(
      """SELECT file, latest_snapshot_id FROM demo."m$metadata_log_entries" ORDER BY file"""))
      .collect().map(r =>
        (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.nonEmpty)
    // every entry is a real commit-log file; the newest declares the
    // head (the empty pre-insert log reads back NULL)
    assert(rows.forall(_._1.contains("commits")))
    assert(rows.map(_._2).max == 2L)
    // timestamps are real and non-null
    val ts = e.query(SqlStatement(
      """SELECT timestamp FROM demo."m$metadata_log_entries""""))
      .collect().map(_.getTimestamp(0))
    assert(ts.forall(_ != null))
  }

  test("t$history mirrors the linear commit chain; unquoted spelling also resolves") {
    val e = freshEngine("meta-hist")
    val n = e.query(SqlStatement(
      "SELECT snapshot_id, is_current_ancestor FROM demo.m$history"))
      .collect()
    assert(n.length == 2 && n.forall(_.getBoolean(1)))
  }

  test("t$files reports current-snapshot parquet files with footer record counts") {
    val e = freshEngine("meta-files")
    val files = e.query(SqlStatement(
      """SELECT file_format, record_count, file_size_in_bytes FROM demo."m$files""""))
      .collect()
    assert(files.nonEmpty)
    assert(files.forall(_.getString(0) == "PARQUET"))
    assert(files.map(_.getLong(1)).sum == 3L) // total records across files
    assert(files.forall(_.getLong(2) > 0))
    // after compaction to one file, the file list shrinks to that file
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.m EXECUTE optimize(file_count => 1)"))
    val compacted = e.query(SqlStatement(
      """SELECT record_count FROM demo."m$files"""")).collect()
    assert(compacted.length == 1 && compacted.head.getLong(0) == 3L)
  }

  test("metadata tables compose with joins and aggregation in plain SQL") {
    val e = freshEngine("meta-compose")
    val total = e.query(SqlStatement(
      """SELECT CAST(SUM(record_count) AS BIGINT) AS n FROM demo."m$files""""))
      .as[Long].head()
    assert(total == 3L)
  }

  test("unknown metadata table kind fails with the typed engine error") {
    val e = freshEngine("meta-unknown")
    val ex = intercept[GraftQueryException] {
      e.query(SqlStatement("""SELECT * FROM demo."m$bogus"""")).collect()
    }
    assert(ex.getMessage.contains("bogus"))
  }

  test("a $-table reference inside a string literal is not rewritten") {
    val e = freshEngine("meta-literal")
    val v = e.query(SqlStatement("""SELECT 'FROM demo."m$snapshots"' AS s"""))
      .as[String].head()
    assert(v == """FROM demo."m$snapshots"""")
  }

  test("rollback_to_snapshot restores an old state as a NEW commit (history preserved)") {
    val e = freshEngine("meta-rollback")
    e.executeNonQuery(SqlStatement("DELETE FROM demo.m WHERE id >= 2"))
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM demo.m")).as[Long].head() == 1L)
    e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.m EXECUTE rollback_to_snapshot(snapshot_id => 2)"))
    // current state is snapshot 2's three rows again
    assert(e.query(SqlStatement("SELECT id FROM demo.m")).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    // and the rollback is itself a commit: 2 inserts + delete + rollback =
    // 4 snapshots, with the deleted state still visible mid-history
    val snaps = e.catalog.snapshots("demo", "m")
    assert(snaps.length == 4)
    assert(e.catalog.readAsOf("demo", "m", snaps(2).committedAtMillis).count() == 1L)
  }

  test("rollback to a nonexistent snapshot is the typed engine error") {
    val e = freshEngine("meta-rollback-bad")
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        "ALTER TABLE demo.m EXECUTE rollback_to_snapshot(snapshot_id => 99)"))
    }
  }

  test("rollback_to_timestamp resolves like FOR TIMESTAMP AS OF and lands a rollback commit") {
    val e = freshEngine("meta-rollback-ts")
    e.executeNonQuery(SqlStatement("DELETE FROM demo.m WHERE id >= 2"))
    // a literal pinned to snapshot 2's commit instant restores its state
    val at = e.catalog.snapshots("demo", "m")(1).committedAtMillis
    val lit = java.time.Instant.ofEpochMilli(at).atZone(java.time.ZoneOffset.UTC)
      .toLocalDateTime.format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    e.executeNonQuery(SqlStatement(
      s"ALTER TABLE demo.m EXECUTE rollback_to_timestamp(timestamp => TIMESTAMP '$lit')"))
    assert(e.query(SqlStatement("SELECT id FROM demo.m")).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    // the rollback is a NEW commit, not history rewrite
    assert(e.catalog.snapshots("demo", "m").length == 4)
    // a timestamp before every snapshot is the typed engine error
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        "ALTER TABLE demo.m EXECUTE rollback_to_timestamp(timestamp => TIMESTAMP '1970-01-02 00:00:00')"))
    }
  }

  test("t$partitions rolls up files per hive partition; '' for unpartitioned") {
    val e = freshEngine("meta-parts")
    // unpartitioned: one rollup row with the empty partition path
    val flat = e.query(SqlStatement(
      """SELECT partition, file_count, record_count FROM demo."m$partitions""""))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(flat.length == 1 && flat.head._1 == "" && flat.head._3 == 3L)

    // partitioned: one row per col=value dir, counts per partition
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.pt (id bigint, dept varchar) WITH (partitioning = ARRAY['dept'])"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.pt VALUES (1, 'a'), (2, 'a'), (3, 'b')"))
    val parts = e.query(SqlStatement(
      """SELECT partition, record_count FROM demo."pt$partitions" ORDER BY partition"""))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(parts.toSeq == Seq(("dept=a", 2L), ("dept=b", 1L)))
  }

  test("FOR VERSION AS OF reads an exact snapshot id and composes with WHERE") {
    val e = freshEngine("meta-version")
    e.executeNonQuery(SqlStatement("DELETE FROM demo.m WHERE id >= 2"))
    // snapshot 1 = first insert (2 rows), 2 = second insert (3), 3 = delete (1)
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM demo.m FOR VERSION AS OF 1")).as[Long].head() == 2L)
    assert(e.query(SqlStatement(
      "SELECT id FROM demo.m FOR VERSION AS OF 2 WHERE id >= 2 ORDER BY id"))
      .as[Long].collect().toSeq == Seq(2L, 3L))
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM demo.m FOR VERSION AS OF 3")).as[Long].head() == 1L)
    intercept[GraftQueryException] {
      e.query(SqlStatement("SELECT * FROM demo.m FOR VERSION AS OF 99"))
    }
  }

  test("FOR VERSION AS OF presents the schema pinned in that snapshot") {
    val e = freshEngine("meta-version-schema")
    e.catalog.addColumn("demo", "m", "extra", org.apache.spark.sql.types.DoubleType)
    e.executeNonQuery(SqlStatement("INSERT INTO demo.m VALUES (7, 'g', 0.5)"))
    assert(e.query(SqlStatement("SELECT * FROM demo.m FOR VERSION AS OF 2"))
      .schema.fieldNames.toSeq == Seq("id", "v"))
    assert(e.query(SqlStatement("SELECT * FROM demo.m FOR VERSION AS OF 3"))
      .schema.fieldNames.toSeq == Seq("id", "v", "extra"))
  }

  test("rollback across schema evolution restores the pre-evolution declared schema") {
    val e = freshEngine("meta-rollback-schema")
    e.catalog.addColumn("demo", "m", "extra", org.apache.spark.sql.types.DoubleType)
    e.executeNonQuery(SqlStatement("INSERT INTO demo.m VALUES (4, 'd', 1.5)"))
    assert(e.catalog.readLatest("demo", "m").schema.fieldNames.toSeq
      == Seq("id", "v", "extra"))
    e.executeNonQuery(SqlStatement(
      "ALTER TABLE demo.m EXECUTE rollback_to_snapshot(snapshot_id => 2)"))
    // declared schema reverted with the data
    assert(e.catalog.readLatest("demo", "m").schema.fieldNames.toSeq == Seq("id", "v"))
    assert(e.catalog.readLatest("demo", "m").count() == 3L)
  }
}
