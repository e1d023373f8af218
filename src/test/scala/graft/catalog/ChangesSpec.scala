package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental / CDC reads ([[SnapshotCatalog.readChanges]], the
  * `t$changes` metadata table): row-level changes between snapshots as
  * insert/delete rows, reading only each commit's TOUCHED files —
  * Iceberg's incremental scan generalized with the changelog shape of
  * Delta's table_changes. The contract a training-data pipeline needs to
  * process only what changed instead of rescanning the corpus.
  */
class ChangesSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-cdc-wh"))
    c.createSchema("s")
    c
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def changesOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, Long)] =
    df.select("id", "v", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, String, Long)].collect().toSet

  test("appends surface as inserts, attributed to their commit, with no shuffle") {
    val c = freshCatalog()
    c.createTable("s", "a", schema)
    c.insert("s", "a", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    c.insert("s", "a", Seq((3L, "c")).toDF("id", "v"))
    val ch = c.readChanges("s", "a", 0L, 2L)
    assert(changesOf(ch) === Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L), (3L, "c", "insert", 2L)))
    // append-only CDC is scan-only: no exchange anywhere in the plan
    val hasShuffle = ch.queryExecution.executedPlan.toString.contains("Exchange")
    assert(!hasShuffle, "append-only changes must not shuffle")
    // bounded range: only the second commit
    assert(changesOf(c.readChanges("s", "a", 1L, 2L)) ===
      Set((3L, "c", "insert", 2L)))
  }

  test("CoW DELETE yields exactly the deleted rows; carried rows cancel out") {
    val c = freshCatalog()
    c.createTable("s", "d", schema)
    c.insert("s", "d", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    c.delete("s", "d", col("id") === 2L)
    val head = c.snapshots("s", "d").last.snapshotId
    assert(changesOf(c.readChanges("s", "d", 1L, head)) ===
      Set((2L, "b", "delete", head)))
  }

  test("UPDATE appears as its delete + insert pair") {
    val c = freshCatalog()
    c.createTable("s", "u", schema)
    c.insert("s", "u", Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    c.update("s", "u", Seq("v" -> lit("B")), col("id") === 2L)
    val head = c.snapshots("s", "u").last.snapshotId
    assert(changesOf(c.readChanges("s", "u", 1L, head)) ===
      Set((2L, "b", "delete", head), (2L, "B", "insert", head)))
  }

  test("merge-on-read DELETE (positional delete file) yields the deleted rows") {
    val c = freshCatalog()
    c.createTable("s", "m", schema, formatVersion = 2)
    c.insert("s", "m", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    c.delete("s", "m", col("id") === 3L)
    val head = c.snapshots("s", "m").last
    assert(c.dataFilePaths("s", "m", head).nonEmpty)
    assert(changesOf(c.readChanges("s", "m", 1L, head.snapshotId)) ===
      Set((3L, "c", "delete", head.snapshotId)))
  }

  test("TRUNCATE reports every prior row as deleted") {
    val c = freshCatalog()
    c.createTable("s", "t", schema)
    c.insert("s", "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    c.truncateCounted("s", "t")
    val head = c.snapshots("s", "t").last.snapshotId
    assert(changesOf(c.readChanges("s", "t", 1L, head)) ===
      Set((1L, "a", "delete", head), (2L, "b", "delete", head)))
  }

  test("compaction rewrites files but reports zero logical changes") {
    val c = freshCatalog()
    c.createTable("s", "o", schema)
    c.insert("s", "o", Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(2))
    c.insert("s", "o", Seq((3L, "c")).toDF("id", "v"))
    val before = c.snapshots("s", "o").last.snapshotId
    c.compact("s", "o")
    val head = c.snapshots("s", "o").last.snapshotId
    assert(head > before)
    assert(c.readChanges("s", "o", before, head).count() === 0L)
  }

  test("the t$changes metadata table surfaces the head commit's changes in SQL") {
    val c = freshCatalog()
    val e = new graft.GraftEngine(spark, c.warehouse)
    e.executeNonQuery(graft.params.SqlStatement(
      "CREATE TABLE s.cdc (id BIGINT, v VARCHAR)"))
    e.executeNonQuery(graft.params.SqlStatement(
      "INSERT INTO s.cdc VALUES (1, 'a'), (2, 'b')"))
    e.executeNonQuery(graft.params.SqlStatement(
      "DELETE FROM s.cdc WHERE id = 1"))
    val rows = e.query(graft.params.SqlStatement(
      "SELECT id, _change_type FROM s.\"cdc$changes\" ORDER BY id"))
      .as[(Long, String)].collect().toSeq
    assert(rows === Seq((1L, "delete")))
  }

  test("changes conform to the evolved schema across an ADD COLUMN") {
    val c = freshCatalog()
    c.createTable("s", "ev", schema)
    c.insert("s", "ev", Seq((1L, "a")).toDF("id", "v"))
    c.addColumn("s", "ev", "extra", LongType)
    c.insert("s", "ev", Seq((2L, "b", 7L)).toDF("id", "v", "extra"))
    val ch = c.readChanges("s", "ev", 0L, 2L)
    assert(ch.columns.toSeq.takeRight(2) === Seq("_change_type", "_commit_snapshot_id"))
    val got = ch.select("id", "extra", "_change_type")
      .as[(Long, Option[Long], String)].collect().toSet
    assert(got === Set((1L, None, "insert"), (2L, Some(7L), "insert")))
  }

  test("a migrated hive layout's adoption snapshot and later DML read as CDC") {
    val c = freshCatalog()
    val lake = tmpDir("cdc-mig-lake")
    Seq((1L, 2020, "a"), (2L, 2021, "b")).toDF("id", "year", "v")
      .write.partitionBy("year").mode("overwrite").parquet(lake)
    c.migrateTable("s", "m", lake)
    c.insert("s", "m", Seq((3L, 2021, "c")).toDF("id", "year", "v"))
    val ch = c.readChanges("s", "m", 0L, 2L)
    val got = ch.select("id", "year", "_change_type", "_commit_snapshot_id")
      .as[(Long, Int, String, Long)].collect().toSet
    // snapshot 1 = the migration itself (the adopted corpus appears as
    // inserts, partition values parsed from the hive paths), snapshot 2
    // = the post-migrate append
    assert(got === Set(
      (1L, 2020, "insert", 1L), (2L, 2021, "insert", 1L),
      (3L, 2021, "insert", 2L)))
  }
}
