package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `ALTER TABLE … SET PROPERTIES` — sort-spec re-clustering and
  * transform-only partition-spec evolution (Iceberg spec evolution,
  * iceberg.apache.org/spec/#partition-evolution): old files keep their
  * old derived directories, new writes lay out under the new spec, and
  * the manifest file index reads both generations in one relation.
  */
class SpecEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-specevo-wh"))
    c.createSchema("s")
    c
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("ts", TimestampType),
    StructField("v", LongType)))

  private def rows(n: Int, monthSpread: Int = 6) = (1 to n).map { i =>
    (i.toLong, s"g${i % 3}",
      java.sql.Timestamp.valueOf(f"2024-${i % monthSpread + 1}%02d-10 00:00:00"),
      i.toLong * 10)
  }.toDF("id", "grp", "ts", "v")

  test("transform retune: month(ts) -> day(ts); both generations read in one relation") {
    val c = freshCatalog()
    c.createTable("s", "t", schema, partitionedBy = Seq("month(ts)"))
    c.insert("s", "t", rows(12))
    c.setPartitionSpec("s", "t", Seq("day(ts)"))
    c.insert("s", "t", rows(12).withColumn("id", col("id") + 100L))
    val all = c.readLatest("s", "t")
    assert(all.count() === 24L)
    assert(all.columns.toSeq === Seq("id", "grp", "ts", "v"))
    // old files live under ts_month=…, new under ts_day=…
    val paths = c.dataFilePaths("s", "t", c.snapshots("s", "t").last)
    assert(paths.exists(_.contains("ts_month=")))
    assert(paths.exists(_.contains("ts_day=")))
    // DML across both generations stays correct
    c.delete("s", "t", col("id") === 5L || col("id") === 105L)
    assert(c.readLatest("s", "t").count() === 22L)
    // SHOW CREATE reflects the evolved spec
    val e = new graft.GraftEngine(spark, c.warehouse)
    val ddl = e.query(graft.params.SqlStatement("SHOW CREATE TABLE s.t"))
      .collect().map(_.getString(0)).mkString("\n")
    assert(ddl.contains("day(ts)") && !ddl.contains("month(ts)"))
  }

  test("identity changes and partitioned<->unpartitioned flips are rejected on written tables") {
    val c = freshCatalog()
    c.createTable("s", "t2", schema, partitionedBy = Seq("grp", "month(ts)"))
    c.insert("s", "t2", rows(6))
    // dropping the identity column from the spec → rejected
    intercept[IllegalArgumentException](
      c.setPartitionSpec("s", "t2", Seq("month(ts)")))
    // swapping identity column → rejected
    intercept[IllegalArgumentException](
      c.setPartitionSpec("s", "t2", Seq("id", "month(ts)")))
    // unpartitioning a written table → rejected
    intercept[IllegalArgumentException](c.setPartitionSpec("s", "t2", Nil))
    // retuning the transform while keeping identity → allowed
    c.setPartitionSpec("s", "t2", Seq("grp", "day(ts)"))
    c.insert("s", "t2", rows(6).withColumn("id", col("id") + 50L))
    assert(c.readLatest("s", "t2").count() === 12L)
    // a NEVER-written table may change freely, including going partitioned
    c.createTable("s", "empty", schema)
    c.setPartitionSpec("s", "empty", Seq("grp"))
    c.insert("s", "empty", rows(3))
    assert(c.readLatest("s", "empty").count() === 3L)
  }

  test("SET PROPERTIES sorted_by re-clusters future writes; SQL surface end-to-end") {
    val c = freshCatalog()
    val e = new graft.GraftEngine(spark, c.warehouse)
    e.executeNonQuery(graft.params.SqlStatement(
      "CREATE TABLE s.srt (id BIGINT, v BIGINT)"))
    e.executeNonQuery(graft.params.SqlStatement(
      "INSERT INTO s.srt VALUES (3, 30), (1, 10), (2, 20)"))
    e.executeNonQuery(graft.params.SqlStatement(
      "ALTER TABLE s.srt SET PROPERTIES sorted_by = ARRAY['id']"))
    assert(c.sortSpec("s", "srt") === Seq("id"))
    // compact applies the new clustering: single file, sorted by id
    c.compact("s", "srt")
    val headEntry = c.manifestEntries("s", "srt", c.snapshots("s", "srt").last)
    assert(headEntry.nonEmpty)
    // zorder validation applies on the evolution path too
    intercept[graft.GraftQueryException](e.executeNonQuery(graft.params.SqlStatement(
      "ALTER TABLE s.srt SET PROPERTIES sorted_by = ARRAY['zorder(id)']")))
    // partitioning property routes through the same statement
    intercept[graft.GraftQueryException](e.executeNonQuery(graft.params.SqlStatement(
      "ALTER TABLE s.srt SET PROPERTIES partitioning = ARRAY['grp']"))) // no such column
    // unknown property is a typed error
    intercept[graft.GraftQueryException](e.executeNonQuery(graft.params.SqlStatement(
      "ALTER TABLE s.srt SET PROPERTIES nope = ARRAY['x']")))
  }
}
