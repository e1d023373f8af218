package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Catalog-level refs: git-like branches over MULTIPLE tables with one
  * atomic publish — Nessie's defining feature (the reference's catalog
  * is Nessie, docker-compose.yml:36). A pipeline that branch-writes a
  * fact AND a dimension table must publish them together: a reader can
  * never observe one without the other.
  */
class CatalogRefsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def freshCatalog(name: String): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir(name))
    c.createSchema("s")
    c
  }

  private def twoTables(c: SnapshotCatalog): Unit = {
    c.createTable("s", "fact", schema)
    c.createTable("s", "dim", schema)
    c.insert("s", "fact", Seq((1L, "f1")).toDF("id", "v"))
    c.insert("s", "dim", Seq((1L, "d1")).toDF("id", "v"))
  }

  test("branch writes to two tables publish together; main untouched before") {
    val c = freshCatalog("cref-basic")
    twoTables(c)
    c.createCatalogBranch("audit", Seq(("s", "fact"), ("s", "dim")))
    val b = c.branch("audit")
    b.insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    b.insert("s", "dim", Seq((2L, "d2")).toDF("id", "v"))
    // main sees NEITHER while the ref is open
    assert(c.readLatest("s", "fact").count() == 1L)
    assert(c.readLatest("s", "dim").count() == 1L)
    c.publishCatalogBranch("audit")
    assert(c.readLatest("s", "fact").count() == 2L)
    assert(c.readLatest("s", "dim").count() == 2L)
    // ref retired after materialization; fully-consumed member branches
    // retire WITH it — a leftover branch log (cut from the old main)
    // would only feed a later same-name recreate a stale base
    assert(!c.listCatalogBranches().contains("audit"))
    assert(!c.listBranches("s", "fact").contains("audit"))
    // ...which is exactly what makes an immediate same-name recreate
    // start from CURRENT main instead of silently adopting the old log
    c.createCatalogBranch("audit", Seq(("s", "fact")))
    c.branch("audit").insert("s", "fact", Seq((3L, "f3")).toDF("id", "v"))
    c.publishCatalogBranch("audit")
    assert(c.readLatest("s", "fact").count() == 3L)
    // physical main logs hold the branch commits (not just the overlay);
    // fact carries a third commit from the recreate-publish above
    val c2 = new SnapshotCatalog(spark, c.warehouse)
    assert(c2.snapshots("s", "fact").size == 3)
    assert(c2.snapshots("s", "dim").size == 2)
  }

  test("the publish CAS alone flips BOTH tables at once (crash before materialize)") {
    val c = freshCatalog("cref-atomic")
    twoTables(c)
    c.createCatalogBranch("wap", Seq(("s", "fact"), ("s", "dim")))
    val b = c.branch("wap")
    b.insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    b.insert("s", "dim", Seq((2L, "d2")).toDF("id", "v"))
    // ONLY the CAS half — the crash window before any main log moved
    c.publishCatalogBranchCas("wap")
    // a FRESH catalog (cold caches, like another process) sees BOTH
    // members' branch heads through main, though no main log advanced
    val r = new SnapshotCatalog(spark, c.warehouse)
    assert(r.readLatest("s", "fact").count() == 2L)
    assert(r.readLatest("s", "dim").count() == 2L)
    assert(r.snapshots("s", "fact").size == 2)
    // time travel composes with the overlay
    assert(r.readVersion("s", "fact",
      r.snapshots("s", "fact").head.snapshotId).count() == 1L)
    // resuming (healing) materializes and retires
    r.materializeCatalogBranch("wap")
    assert(!r.listCatalogBranches().contains("wap"))
    assert(r.readLatest("s", "fact").count() == 2L)
    assert(r.readLatest("s", "dim").count() == 2L)
  }

  test("a writer on top of the published-but-unmaterialized view self-heals the log") {
    val c = freshCatalog("cref-selfheal")
    twoTables(c)
    c.createCatalogBranch("wap", Seq(("s", "fact"), ("s", "dim")))
    c.branch("wap").insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.publishCatalogBranchCas("wap")
    // main write lands ON TOP of the overlaid state and materializes it
    c.insert("s", "fact", Seq((3L, "f3")).toDF("id", "v"))
    assert(c.readLatest("s", "fact").count() == 3L)
    assert(c.snapshots("s", "fact").map(_.snapshotId) == Seq(1L, 2L, 3L))
    c.materializeCatalogBranch("wap")
    assert(c.readLatest("s", "fact").count() == 3L)
  }

  test("diverged member: typed conflict naming the tables, NOTHING published") {
    val c = freshCatalog("cref-conflict")
    twoTables(c)
    c.createCatalogBranch("wap", Seq(("s", "fact"), ("s", "dim")))
    c.branch("wap").insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.branch("wap").insert("s", "dim", Seq((2L, "d2")).toDF("id", "v"))
    // main advances independently on ONE member only
    c.insert("s", "dim", Seq((9L, "dx")).toDF("id", "v"))
    val ex = intercept[CatalogPublishConflictException] {
      c.publishCatalogBranch("wap")
    }
    assert(ex.tables == Seq("s.dim"))
    // nothing published: fact still at 1 row, ref still open
    assert(c.readLatest("s", "fact").count() == 1L)
    assert(c.listCatalogBranches()("wap").state == "open")
  }

  test("drop discards an open ref and its member branches") {
    val c = freshCatalog("cref-drop")
    twoTables(c)
    c.createCatalogBranch("tmp", Seq(("s", "fact"), ("s", "dim")))
    c.branch("tmp").insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.dropCatalogBranch("tmp")
    assert(!c.listCatalogBranches().contains("tmp"))
    assert(!c.listBranches("s", "fact").contains("tmp"))
    assert(c.readLatest("s", "fact").count() == 1L)
  }

  test("SQL surface: CALL create/publish/drop_catalog_branch + branch DML on members") {
    val c = freshCatalog("cref-sql")
    twoTables(c)
    val e = new graft.GraftEngine(spark, c.warehouse)
    e.executeNonQuery(graft.params.SqlStatement(
      "CALL system.create_catalog_branch('wap', ARRAY['s.fact', 's.dim'])"))
    // member branches are ordinary branches: SQL branch DML just works
    e.executeNonQuery(graft.params.SqlStatement(
      "INSERT INTO s.\"fact@wap\" VALUES (2, 'f2')"))
    e.executeNonQuery(graft.params.SqlStatement(
      "INSERT INTO s.\"dim@wap\" VALUES (2, 'd2')"))
    assert(c.readLatest("s", "fact").count() == 1L)
    e.executeNonQuery(graft.params.SqlStatement(
      "CALL system.publish_catalog_branch('wap')"))
    assert(c.readLatest("s", "fact").count() == 2L)
    assert(c.readLatest("s", "dim").count() == 2L)
    // second branch dropped through SQL
    e.executeNonQuery(graft.params.SqlStatement(
      "CALL system.create_catalog_branch(name => 'tmp', tables => ARRAY['s.fact'])"))
    e.executeNonQuery(graft.params.SqlStatement(
      "CALL system.drop_catalog_branch('tmp')"))
    assert(!c.listCatalogBranches().contains("tmp"))
    // typed conflict surfaces through the engine error contract
    e.executeNonQuery(graft.params.SqlStatement(
      "CALL system.create_catalog_branch('w2', ARRAY['s.fact', 's.dim'])"))
    e.executeNonQuery(graft.params.SqlStatement(
      "INSERT INTO s.\"fact@w2\" VALUES (3, 'f3')"))
    e.executeNonQuery(graft.params.SqlStatement(
      "INSERT INTO s.fact VALUES (9, 'fx')")) // main diverges on a member
    val ex = intercept[graft.GraftQueryException](e.executeNonQuery(
      graft.params.SqlStatement("CALL system.publish_catalog_branch('w2')")))
    assert(ex.getMessage.contains("s.fact"))
  }

  test("branch commits made AFTER the publish CAS stay on the branch") {
    val c = freshCatalog("cref-postpin")
    twoTables(c)
    c.createCatalogBranch("wap", Seq(("s", "fact")))
    c.branch("wap").insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.publishCatalogBranchCas("wap")
    // the overlay readers observed exactly head=2 — a branch write that
    // lands after the pin is NOT part of the atomic publish
    c.branch("wap").insert("s", "fact", Seq((3L, "late")).toDF("id", "v"))
    c.materializeCatalogBranch("wap")
    assert(c.readLatest("s", "fact").count() == 2L)
    assert(!c.readLatest("s", "fact").select("v").as[String]
      .collect().contains("late"))
    // the post-pin commit survives ON the branch (not dropped, not
    // published) — the branch stays for a follow-up publish
    assert(c.listBranches("s", "fact").contains("wap"))
    assert(c.branch("wap").readLatest("s", "fact").count() == 3L)
  }

  test("mergeBranch upTo replays only the pinned prefix and leaves the branch log intact") {
    val c = freshCatalog("cref-upto")
    twoTables(c)
    c.createBranch("s", "fact", "b")
    c.branch("b").insert("s", "fact", Seq((2L, "b1")).toDF("id", "v"))
    val pinnedId = c.branch("b").snapshots("s", "fact").map(_.snapshotId).max
    c.branch("b").insert("s", "fact", Seq((3L, "b2")).toDF("id", "v"))
    // main diverges → merge is a replay, truncated at the pinned head
    c.insert("s", "fact", Seq((9L, "m")).toDF("id", "v"))
    c.mergeBranch("s", "fact", "b", upTo = Some(pinnedId))
    val mainV = c.readLatest("s", "fact").select("v").as[String].collect().toSet
    assert(mainV == Set("f1", "b1", "m"), s"main saw $mainV")
    // branch untouched by the truncated merge: still both branch commits
    assert(c.branch("b").readLatest("s", "fact").select("v").as[String]
      .collect().toSet == Set("f1", "b1", "b2"))
  }

  test("guards: duplicate name, unknown table, _catalog_refs never lists as a schema") {
    val c = freshCatalog("cref-guards")
    twoTables(c)
    c.createCatalogBranch("a", Seq(("s", "fact")))
    intercept[IllegalArgumentException] {
      c.createCatalogBranch("a", Seq(("s", "dim")))
    }
    intercept[IllegalArgumentException] {
      c.createCatalogBranch("b", Seq(("s", "nope")))
    }
    assert(c.listSchemas() == Seq("s"))
    c.dropCatalogBranch("a")
  }

  test("merge_catalog_branch: diverged members replay atomically onto main") {
    val c = freshCatalog("cref-merge")
    twoTables(c)
    c.createCatalogBranch("wap", Seq(("s", "fact"), ("s", "dim")))
    c.branch("wap").insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.branch("wap").insert("s", "dim", Seq((2L, "d2")).toDF("id", "v"))
    // main advances independently on one member — publish would throw,
    // merge replays
    c.insert("s", "dim", Seq((9L, "dx")).toDF("id", "v"))
    c.mergeCatalogBranch("wap")
    // both sides' rows present on BOTH members, ref retired
    assert(c.readLatest("s", "fact").select("v").as[String].collect().toSet ==
      Set("f1", "f2"))
    assert(c.readLatest("s", "dim").select("v").as[String].collect().toSet ==
      Set("d1", "d2", "dx"))
    assert(!c.listCatalogBranches().contains("wap"))
    // physical logs hold the merge (a cold catalog agrees)
    val c2 = new SnapshotCatalog(spark, c.warehouse)
    assert(c2.readLatest("s", "dim").count() == 3L)
    assert(c2.readLatest("s", "fact").count() == 2L)
  }

  test("merge_catalog_branch: non-append branch DML on a diverged member aborts, nothing published") {
    import org.apache.spark.sql.functions.col
    val c = freshCatalog("cref-merge-conflict")
    twoTables(c)
    c.createCatalogBranch("wap", Seq(("s", "fact"), ("s", "dim")))
    c.branch("wap").insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.branch("wap").delete("s", "dim", col("id") === 1L) // non-append
    c.insert("s", "dim", Seq((9L, "dx")).toDF("id", "v")) // main diverges
    val ex = intercept[CatalogPublishConflictException] {
      c.mergeCatalogBranch("wap")
    }
    assert(ex.tables == Seq("s.dim"))
    // nothing published: fact unchanged on main, ref still open
    assert(c.readLatest("s", "fact").count() == 1L)
    assert(c.readLatest("s", "dim").select("v").as[String].collect().toSet ==
      Set("d1", "dx"))
    assert(c.listCatalogBranches()("wap").state == "open")
  }

  test("merge_catalog_branch: fast-forward members (main unmoved) merge like publish") {
    val c = freshCatalog("cref-merge-ff")
    twoTables(c)
    c.createCatalogBranch("wap", Seq(("s", "fact"), ("s", "dim")))
    c.branch("wap").insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    // dim's branch is unmoved and main moved only on dim
    c.insert("s", "dim", Seq((9L, "dx")).toDF("id", "v"))
    c.mergeCatalogBranch("wap")
    assert(c.readLatest("s", "fact").count() == 2L)
    assert(c.readLatest("s", "dim").select("v").as[String].collect().toSet ==
      Set("d1", "dx"))
    assert(!c.listCatalogBranches().contains("wap"))
  }

  test("SQL surface: CALL system.merge_catalog_branch replays a diverged ref") {
    val c = freshCatalog("cref-merge-sql")
    twoTables(c)
    val engine = new graft.GraftEngine(spark, c.warehouse)
    engine.executeNonQuery(graft.params.SqlStatement(
      "CALL system.create_catalog_branch('wap', ARRAY['s.fact','s.dim'])"))
    c.branch("wap").insert("s", "fact", Seq((2L, "f2")).toDF("id", "v"))
    c.insert("s", "fact", Seq((7L, "fm")).toDF("id", "v")) // diverge
    engine.executeNonQuery(graft.params.SqlStatement(
      "CALL system.merge_catalog_branch('wap')"))
    assert(c.readLatest("s", "fact").select("v").as[String].collect().toSet ==
      Set("f1", "f2", "fm"))
    assert(!c.listCatalogBranches().contains("wap"))
  }
}
