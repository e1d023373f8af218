package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Catalog-level tags: one immutable name pinning the WHOLE catalog's
  * state (Nessie's tag model at catalog scope) — the audit /
  * reproducibility read "query every table as tagged v2026-08".
  */
class CatalogTagsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def twoTables(name: String): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir(name))
    c.createSchema("s")
    c.createTable("s", "fact", schema)
    c.createTable("s", "dim", schema)
    c.insert("s", "fact", Seq((1L, "f1")).toDF("id", "v"))
    c.insert("s", "dim", Seq((1L, "d1")).toDF("id", "v"))
    c
  }

  test("one tag reads every member at a consistent state after mains advance") {
    val c = twoTables("ctag-basic")
    c.createCatalogTag("v1")
    assert(c.listCatalogTags() == Seq("v1"))
    // both mains move on
    c.insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.insert("s", "dim", Seq((2L, "d2")).toDF("id", "v"))
    // the tag still reads the creation-instant state of EVERY member
    assert(c.readRef("s", "fact", "v1").select("v").as[String].collect().toSeq
      == Seq("f1"))
    assert(c.readRef("s", "dim", "v1").select("v").as[String].collect().toSeq
      == Seq("d1"))
    assert(c.readLatest("s", "fact").count() == 2L)
    c.dropCatalogTag("v1")
    intercept[IllegalArgumentException](c.readRef("s", "fact", "v1"))
  }

  test("resolution order: per-table tag shadows a same-name catalog tag") {
    val c = twoTables("ctag-order")
    c.createTag("s", "fact", "pin") // per-table, at f1
    c.insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.createCatalogTag("pin") // catalog-wide, at f1+f2
    assert(c.readRef("s", "fact", "pin").count() == 1L) // table tag wins
    assert(c.readRef("s", "dim", "pin").count() == 1L) // only catalog tag has dim
  }

  test("expire protects catalog-tag-pinned snapshots; tag read survives") {
    val c = twoTables("ctag-expire")
    c.createCatalogTag("keep")
    c.insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.insert("s", "fact", Seq((3L, "f3")).toDF("id", "v"))
    c.expireSnapshots("s", "fact", System.currentTimeMillis() + 1000)
    assert(c.readRef("s", "fact", "keep").select("v").as[String].collect().toSeq
      == Seq("f1"))
    assert(c.readLatest("s", "fact").count() == 3L)
  }

  test("guards: duplicate name fails, unknown drop fails, member-scoped tags, no schema leak") {
    val c = twoTables("ctag-guards")
    c.createCatalogTag("a", Seq(("s", "fact")))
    intercept[IllegalArgumentException](c.createCatalogTag("a"))
    intercept[IllegalArgumentException](c.dropCatalogTag("nope"))
    // a member-scoped tag does not pin non-members
    intercept[IllegalArgumentException](c.readRef("s", "dim", "a"))
    assert(c.readRef("s", "fact", "a").count() == 1L)
    assert(c.listSchemas() == Seq("s")) // _catalog_tags never lists
    intercept[IllegalArgumentException](c.createCatalogTag("b", Seq(("s", "nope"))))
  }

  test("SQL surface: CALL create/drop_catalog_tag + FOR VERSION AS OF '<tag>'") {
    val c = twoTables("ctag-sql")
    val e = new graft.GraftEngine(spark, c.warehouse)
    e.executeNonQuery(graft.params.SqlStatement(
      "CALL system.create_catalog_tag('v2026_08')"))
    c.insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.insert("s", "dim", Seq((2L, "d2")).toDF("id", "v"))
    val rows = e.query(graft.params.SqlStatement(
      """SELECT f.v AS fv, d.v AS dv
        |FROM s.fact FOR VERSION AS OF 'v2026_08' f
        |JOIN s.dim FOR VERSION AS OF 'v2026_08' d ON f.id = d.id""".stripMargin))
      .collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("f1", "d1")))
    e.executeNonQuery(graft.params.SqlStatement(
      "CALL system.drop_catalog_tag('v2026_08')"))
    assert(c.listCatalogTags().isEmpty)
  }
}
