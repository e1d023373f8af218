package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-7 advice hardening: DDL guards that keep supported statements
  * from wedging a table or silently succeeding where Trino would fail.
  *  - DROP COLUMN of a `sorted_by` column is rejected; RENAME COLUMN of
  *    one rewrites the sort spec so later writes still cluster.
  *  - UPDATE validates SET target columns BEFORE the zero-match
  *    short-circuit (Trino fails analysis; a silent no-op commit hides
  *    the typo).
  *  - `__graft_`-prefixed column names are rejected everywhere (internal
  *    provenance namespace); `file_path`/`pos` rejected on
  *    format_version = 2 tables (positional-delete schema collision).
  *  - TRUNCATE derives its removed-row count and its commit from ONE
  *    commit-log read.
  */
class AdviceGuardsSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-guard-wh"))
    c.createSchema("s")
    c
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  test("DROP COLUMN of a sorted_by column is rejected; table stays writable") {
    val c = freshCatalog()
    c.createTable("s", "t", schema, sortedBy = Seq("id"))
    c.insert("s", "t", Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException](c.dropColumn("s", "t", "id"))
    assert(e.getMessage.contains("sort column"))
    // the guard kept the spec intact: a later insert still clusters fine
    c.insert("s", "t", Seq((2L, "b")).toDF("id", "v"))
    assert(c.readLatest("s", "t").count() === 2)
  }

  test("RENAME COLUMN of a sorted_by column follows into the sort spec (direction kept)") {
    val c = freshCatalog()
    c.createTable("s", "t", schema, sortedBy = Seq("id DESC"))
    c.insert("s", "t", Seq((1L, "a")).toDF("id", "v"))
    c.renameColumn("s", "t", "id", "ident")
    assert(c.sortSpec("s", "t") === Seq("ident DESC"))
    // writes resolve the renamed sort column — the table is NOT wedged
    c.insert("s", "t", Seq((2L, "b")).toDF("ident", "v"))
    assert(c.readLatest("s", "t").count() === 2)
  }

  test("UPDATE with a bogus SET column fails even when the predicate matches zero rows") {
    val c = freshCatalog()
    c.createTable("s", "t", schema)
    c.insert("s", "t", Seq((1L, "a")).toDF("id", "v"))
    val before = c.snapshots("s", "t").size
    val e = intercept[IllegalArgumentException](
      c.updateCounted("s", "t", Seq("bogus" -> lit(1)), lit(false)))
    assert(e.getMessage.contains("bogus"))
    assert(c.snapshots("s", "t").size === before, "no no-op commit was appended")
  }

  test("UPDATE with a bogus SET column fails on a v2 (merge-on-read) table too") {
    val c = freshCatalog()
    c.createTable("s", "t2", schema, formatVersion = 2)
    c.insert("s", "t2", Seq((1L, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException](
      c.updateCounted("s", "t2", Seq("bogus" -> lit(1)), lit(false)))
  }

  test("MERGE with a bogus UPDATE SET column fails analysis up front") {
    val c = freshCatalog()
    c.createTable("s", "t", schema)
    c.insert("s", "t", Seq((1L, "a")).toDF("id", "v"))
    val src = Seq((99L, "z")).toDF("id", "v") // matches nothing
    val e = intercept[IllegalArgumentException](
      c.mergeInto("s", "t", src, "t", "s",
        expr("t.id = s.id"),
        Seq(MergeUpdateAction(None, Seq("bogus" -> lit(1)))), Nil))
    assert(e.getMessage.contains("bogus"))
  }

  test("__graft_ column names are rejected at CREATE / ADD / RENAME") {
    val c = freshCatalog()
    intercept[IllegalArgumentException](
      c.createTable("s", "bad", StructType(Seq(
        StructField("__graft_file", StringType), StructField("x", LongType)))))
    c.createTable("s", "ok", schema)
    intercept[IllegalArgumentException](
      c.addColumn("s", "ok", "__graft_pos", LongType))
    intercept[IllegalArgumentException](
      c.renameColumn("s", "ok", "v", "__graft_v"))
  }

  test("file_path / pos are rejected only on format_version = 2 tables") {
    val c = freshCatalog()
    // v1: fine — no positional-delete machinery ever touches the table
    c.createTable("s", "v1", StructType(Seq(
      StructField("file_path", StringType), StructField("pos", LongType))))
    c.insert("s", "v1", Seq(("a", 1L)).toDF("file_path", "pos"))
    assert(c.readLatest("s", "v1").count() === 1)
    // v2: the delete anti-join would be ambiguous on every read
    intercept[IllegalArgumentException](
      c.createTable("s", "v2", StructType(Seq(
        StructField("file_path", StringType), StructField("x", LongType))),
        formatVersion = 2))
    c.createTable("s", "v2ok", schema, formatVersion = 2)
    intercept[IllegalArgumentException](c.addColumn("s", "v2ok", "pos", LongType))
    intercept[IllegalArgumentException](c.renameColumn("s", "v2ok", "v", "file_path"))
  }

  test("TRUNCATE count and commit derive from one observed snapshot") {
    val c = freshCatalog()
    c.createTable("s", "t", schema)
    c.insert("s", "t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    val (snap, n) = c.truncateCounted("s", "t")
    assert(n === 3L)
    assert(snap.dirs.isEmpty)
    assert(c.readLatest("s", "t").count() === 0)
  }
}
