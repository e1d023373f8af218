package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scoped compaction — Trino `ALTER TABLE … EXECUTE optimize WHERE p`
  * (Iceberg rewrite_data_files with a filter): only files whose manifest
  * bounds may match the predicate rewrite; everything else carries by
  * manifest reference. At 100 TB you compact yesterday's partition, not
  * the table. Files addressed by pending positional deletes always join
  * the rewrite so the delete files fold away completely.
  */
class CompactWhereSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("v", LongType)))

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-cw-wh"))
    c.createSchema("s")
    c
  }

  /** Three single-file commits with DISJOINT id ranges 1-4 / 11-14 / 21-24. */
  private def seed(c: SnapshotCatalog, table: String, formatVersion: Int = 1): Unit = {
    c.createTable("s", table, schema, formatVersion = formatVersion)
    Seq("a", "b", "c").zipWithIndex.foreach { case (g, i) =>
      c.insert("s", table,
        (1L to 4L).map(k => (i * 10L + k, g, k)).toDF("id", "grp", "v").coalesce(1))
    }
  }

  private def files(c: SnapshotCatalog, t: String): Set[String] =
    c.dataFilePaths("s", t, c.snapshots("s", t).last).toSet

  test("WHERE-scoped compact rewrites only bounds-matching files") {
    val c = freshCatalog()
    seed(c, "t1")
    val before = files(c, "t1")
    assert(before.size == 3)
    val snap = c.compact("s", "t1", numFiles = 1, where = Some(col("id") <= 4L))
    assert(snap.operation.contains("replace"))
    val after = files(c, "t1")
    // the two non-matching files carry by path; the matching one rewrote
    assert((before intersect after).size == 2)
    assert(after.size == 3)
    assert(c.readLatest("s", "t1").count() == 12)
    assert(c.readLatest("s", "t1").filter(col("id") <= 4L)
      .select("grp").distinct().as[String].collect().toSeq == Seq("a"))
  }

  test("two matching files fold into file_count files, third carries") {
    val c = freshCatalog()
    seed(c, "t2")
    val before = files(c, "t2")
    c.compact("s", "t2", numFiles = 1, where = Some(col("id") <= 14L))
    val after = files(c, "t2")
    assert((before intersect after).size == 1) // only ids 21-24 carried
    assert(after.size == 2)                    // 1 carried + 1 compacted
    assert(c.readLatest("s", "t2").count() == 12)
  }

  test("no-match predicate commits a metadata-only replace") {
    val c = freshCatalog()
    seed(c, "t3")
    val before = files(c, "t3")
    val snapsBefore = c.snapshots("s", "t3").size
    c.compact("s", "t3", numFiles = 1, where = Some(col("id") > 1000L))
    assert(files(c, "t3") == before)
    assert(c.snapshots("s", "t3").size == snapsBefore + 1)
    assert(c.snapshots("s", "t3").last.operation.contains("replace"))
  }

  test("pending MoR deletes fold: addressed files join the rewrite") {
    val c = freshCatalog()
    seed(c, "t4", formatVersion = 2)
    c.delete("s", "t4", col("id") === 12L) // positional delete on file 2
    assert(c.snapshots("s", "t4").last.deletes.nonEmpty)
    val before = files(c, "t4")
    // predicate targets file 1 only, but file 2 is delete-addressed →
    // both rewrite, file 3 carries, zero delete files remain
    c.compact("s", "t4", numFiles = 1, where = Some(col("id") <= 4L))
    val last = c.snapshots("s", "t4").last
    assert(last.deletes.isEmpty)
    assert((before intersect files(c, "t4")).size == 1)
    val rows = c.readLatest("s", "t4").select("id").as[Long].collect().toSet
    assert(!rows.contains(12L) && rows.size == 11)
  }

  test("SQL surface: ALTER TABLE EXECUTE optimize(file_count => 1) WHERE …") {
    val c = freshCatalog()
    seed(c, "t5")
    val engine = new graft.GraftEngine(spark, c.warehouse)
    val before = files(c, "t5")
    engine.executeNonQuery(graft.params.SqlStatement(
      "ALTER TABLE s.t5 EXECUTE optimize(file_count => 1) WHERE id <= 14"))
    val after = files(c, "t5")
    assert((before intersect after).size == 1)
    assert(after.size == 2)
    assert(engine.queryScalar[Long](graft.params.SqlStatement(
      "SELECT count(*) FROM s.t5")).contains(12L))
    // time travel still sees the pre-compaction layout's rows
    val first = c.snapshots("s", "t5").head
    assert(c.readAsOf("s", "t5", first.committedAtMillis).count() == 4)
  }
}
