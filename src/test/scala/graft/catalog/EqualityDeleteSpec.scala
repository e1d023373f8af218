package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Equality deletes — Iceberg v2's second delete-file kind, the
  * streaming-upsert write shape (Flink CDC writers): `upsert` commits
  * the batch plus one key file WITHOUT reading the target; reads shadow
  * prior rows whose keys match, but only in files the delete's
  * `appliesTo` snapshot covers (the sequence-number rule), so later
  * inserts of a deleted key stick. Compaction folds pending deletes.
  */
class EqualityDeleteSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def freshCatalog(name: String): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir(name))
    c.createSchema("s")
    c
  }

  private def v2Table(c: SnapshotCatalog, t: String): Unit = {
    c.createTable("s", t, schema, formatVersion = 2)
    c.insert("s", t, Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v"))
  }

  private def state(c: SnapshotCatalog, t: String): Seq[(Long, String)] =
    c.readLatest("s", t).as[(Long, String)].collect().sortBy(_._1).toSeq

  test("upsert is last-wins and rewrites no data file") {
    val c = freshCatalog("eq-basic")
    v2Table(c, "t")
    val before = c.dataFilePaths("s", "t", c.snapshots("s", "t").last).toSet
    c.upsert("s", "t", Seq((2L, "B2"), (5L, "e")).toDF("id", "v"), Seq("id"))
    assert(state(c, "t") == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d"), (5L, "e")))
    // every pre-upsert data file is still referenced — nothing rewritten
    val after = c.dataFilePaths("s", "t", c.snapshots("s", "t").last).toSet
    assert(before.subsetOf(after))
    assert(c.snapshots("s", "t").last.eqDeletes.size == 1)
  }

  test("a later plain insert of an upsert-deleted key survives (sequence rule)") {
    val c = freshCatalog("eq-seq")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"))
    c.insert("s", "t", Seq((2L, "B3")).toDF("id", "v"))
    // both the upserted row and the re-inserted one live (the eq-delete
    // covers only files of its appliesTo snapshot)
    assert(state(c, "t").filter(_._1 == 2L).map(_._2).sorted == Seq("B2", "B3"))
  }

  test("chained upserts: the newest value wins across commits") {
    val c = freshCatalog("eq-chain")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"))
    c.upsert("s", "t", Seq((2L, "B3"), (3L, "C2")).toDF("id", "v"), Seq("id"))
    assert(state(c, "t") == Seq((1L, "a"), (2L, "B3"), (3L, "C2"), (4L, "d")))
  }

  test("positional MoR DELETE composes over equality-shadowed state") {
    val c = freshCatalog("eq-mor")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"))
    c.delete("s", "t", col("id") === 2L) // kills the upserted row positionally
    assert(state(c, "t") == Seq((1L, "a"), (3L, "c"), (4L, "d")))
    c.delete("s", "t", col("v") === "a")
    assert(state(c, "t") == Seq((3L, "c"), (4L, "d")))
  }

  test("time travel to the pre-upsert snapshot is untouched") {
    val c = freshCatalog("eq-tt")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"))
    val pre = c.snapshots("s", "t").head
    assert(c.readVersion("s", "t", pre.snapshotId)
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("compaction folds pending equality deletes; state unchanged") {
    val c = freshCatalog("eq-compact")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2"), (5L, "e")).toDF("id", "v"), Seq("id"))
    val expect = state(c, "t")
    c.compact("s", "t")
    assert(c.snapshots("s", "t").last.eqDeletes.isEmpty)
    assert(state(c, "t") == expect)
  }

  test("CDC across an upsert reports the shadowed row as delete + new rows as inserts") {
    val c = freshCatalog("eq-cdc")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2"), (5L, "e")).toDF("id", "v"), Seq("id"))
    val snaps = c.snapshots("s", "t")
    val ch = c.readChanges("s", "t", snaps.head.snapshotId, snaps.last.snapshotId)
      .select($"id", $"v", $"_change_type").as[(Long, String, String)]
      .collect().sortBy(r => (r._3, r._1)).toSeq
    assert(ch == Seq((2L, "b", "delete"), (2L, "B2", "insert"), (5L, "e", "insert")))
    // full replay invariant from empty
    val all = c.readChanges("s", "t", 0L, snaps.last.snapshotId)
      .select($"id", $"v", $"_change_type")
    val ins = all.filter($"_change_type" === "insert").drop("_change_type")
    val del = all.filter($"_change_type" === "delete").drop("_change_type")
    val reconstructed = ins.exceptAll(del).as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(reconstructed == state(c, "t"))
  }

  test("transactional upsert is idempotent per (appId, version)") {
    val c = freshCatalog("eq-txn")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"), Some(("app", 7L)))
    val n = c.snapshots("s", "t").size
    c.upsert("s", "t", Seq((2L, "DUP")).toDF("id", "v"), Seq("id"), Some(("app", 7L)))
    assert(c.snapshots("s", "t").size == n) // replay skipped
    assert(state(c, "t").filter(_._1 == 2L) == Seq((2L, "B2")))
  }

  test("guards: v1 table and unknown key rejected; commit-log round-trips eq metadata") {
    val c = freshCatalog("eq-guards")
    c.createTable("s", "v1t", schema) // format_version = 1
    c.insert("s", "v1t", Seq((1L, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      c.upsert("s", "v1t", Seq((1L, "x")).toDF("id", "v"), Seq("id"))
    }
    v2Table(c, "t")
    intercept[IllegalArgumentException] {
      c.upsert("s", "t", Seq((1L, "x")).toDF("id", "v"), Seq("bogus"))
    }
    c.upsert("s", "t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"))
    // a FRESH catalog instance (new caches, re-parsed log) sees the same state
    val c2 = new SnapshotCatalog(spark, c.warehouse)
    assert(c2.readLatest("s", "t").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
    assert(c2.snapshots("s", "t").last.eqDeletes.head.keys == Seq("id"))
  }

  test("expire protects the appliesTo snapshot — shadowed rows never resurrect") {
    val c = freshCatalog("eq-expire")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"))
    // aggressive expiry: everything older than the head. WITHOUT the
    // appliesTo protection this trims snapshot 1 and the read would
    // silently re-expose (2, 'b')
    c.expireSnapshots("s", "t", c.snapshots("s", "t").last.committedAtMillis)
    assert(c.snapshots("s", "t").exists(_.snapshotId == 1L),
      "the eq-delete's appliesTo snapshot must survive expiry")
    assert(state(c, "t") == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
  }

  test("the append-only streaming contract rejects upsert commits (fail loud)") {
    val c = freshCatalog("eq-append")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"))
    val snaps = c.snapshots("s", "t")
    val ex = intercept[IllegalStateException] {
      c.appendsBetween("s", "t", snaps.head.snapshotId, snaps.last.snapshotId)
    }
    assert(ex.getMessage.contains("not append-only"))
    // skipChangeCommits drops the upsert commit instead of throwing
    assert(c.appendsBetween("s", "t", snaps.head.snapshotId,
      snaps.last.snapshotId, skipChangeCommits = true).count() == 0L)
  }

  test("pending-delete read plan is LINEAR: join count constant at N>=4 pending deletes") {
    val c = freshCatalog("eq-linear")
    v2Table(c, "t")
    for (i <- 1 to 5)
      c.upsert("s", "t", Seq((i.toLong, s"U$i")).toDF("id", "v"), Seq("id"))
    assert(c.snapshots("s", "t").last.eqDeletes.size == 5)
    val df = c.readLatest("s", "t")
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    // one applicable-delete attach join + one key anti-join per distinct
    // key-column set (here 1) — NOT a split/union per pending delete,
    // which built a 2^N-leaf plan on the streaming-CDC read path
    assert(joins <= 3, s"expected a constant join count, got $joins")
    assert(state(c, "t") ==
      Seq((1L, "U1"), (2L, "U2"), (3L, "U3"), (4L, "U4"), (5L, "U5")))
  }

  test("mixed key sets across pending deletes still resolve (one anti-join per key set)") {
    val c = freshCatalog("eq-keysets")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"))
    // second pending delete keyed on BOTH columns: shadows only exact
    // (id, v) matches in files its appliesTo snapshot covers
    c.upsert("s", "t", Seq((3L, "c")).toDF("id", "v"), Seq("id", "v"))
    assert(state(c, "t") == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
  }

  test("partitioned upsert: partition pruning survives the eq-delete wrapper (Flink-CDC shape)") {
    val c = freshCatalog("eq-part")
    val pschema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", StringType),
      StructField("region", StringType)))
    c.createTable("s", "p", pschema, partitionedBy = Seq("region"),
      formatVersion = 2)
    c.insert("s", "p", Seq(
      (1L, "a", "eu"), (2L, "b", "eu"),
      (3L, "c", "us"), (4L, "d", "ap")).toDF("id", "v", "region"))
    // keyed CDC upsert lands new versions + one key file, no target read
    c.upsert("s", "p", Seq((2L, "B2", "eu"), (5L, "e", "us"))
      .toDF("id", "v", "region"), Seq("id"))
    val all = c.readLatest("s", "p")
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(all == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d"), (5L, "e")))
    // a partition-filtered read over the upserted state scans ONLY that
    // partition's files — the filter pushes through the attach +
    // anti-join wrapper to the manifest scan
    val pruned = c.readLatest("s", "p").filter(col("region") === "ap")
    pruned.collect()
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(st.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    // data-side scan = the one over the table's own partitioned layout
    val dataScan = allScans(pruned.queryExecution.executedPlan)
      .filter(_.relation.location.isInstanceOf[
        org.apache.spark.sql.GraftManifestFileIndex]).head
    assert(dataScan.metrics("numFiles").value == 1L,
      s"expected the ap partition's single file, " +
        s"got ${dataScan.metrics("numFiles").value}")
    assert(pruned.select("id").as[Long].collect().toSeq == Seq(4L))
    // upserting into one partition then filtering another: the shadowed
    // row stays invisible, the untouched partition stays one-file
    c.upsert("s", "p", Seq((3L, "C2", "us")).toDF("id", "v", "region"), Seq("id"))
    assert(c.readLatest("s", "p").filter(col("region") === "us")
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((3L, "C2"), (5L, "e")))
  }

  test("past-threshold delete files read distributed: identical results, no driver collect") {
    // force EVERY eq-delete key file past the driver-materialization
    // gate: the read must serve the anti-join from a distributed parquet
    // scan (no LocalRelation, no forced broadcast) with identical results
    val saved = SnapshotCatalog.eqDelDriverMaxRows
    try {
      SnapshotCatalog.eqDelDriverMaxRows = 0L
      val c = freshCatalog("eq-dist")
      v2Table(c, "t")
      c.upsert("s", "t", Seq((2L, "B2"), (5L, "e")).toDF("id", "v"), Seq("id"))
      c.upsert("s", "t", Seq((2L, "B3")).toDF("id", "v"), Seq("id"))
      assert(state(c, "t") ===
        Seq((1L, "a"), (2L, "B3"), (3L, "c"), (4L, "d"), (5L, "e")))
      // the key side must be a file scan, not driver rows (the KB-scale
      // per-file delete-id map staying a LocalRelation is fine — only
      // the __graft_eq_* key columns must never be driver-materialized)
      val plan = c.readLatest("s", "t").queryExecution.optimizedPlan.toString
      assert(!plan.linesIterator.exists(l =>
        l.contains("LocalRelation") && l.contains("__graft_eq_")),
        s"distributed path still materialized keys on the driver:\n$plan")
      assert(plan.contains("LeftAnti"))
    } finally SnapshotCatalog.eqDelDriverMaxRows = saved
    // and the same history under the default gate matches exactly
    val c2 = freshCatalog("eq-dist-ref")
    v2Table(c2, "t")
    c2.upsert("s", "t", Seq((2L, "B2"), (5L, "e")).toDF("id", "v"), Seq("id"))
    c2.upsert("s", "t", Seq((2L, "B3")).toDF("id", "v"), Seq("id"))
    assert(state(c2, "t") ===
      Seq((1L, "a"), (2L, "B3"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("DDL on a pending equality-delete key is rejected (fold first)") {
    val c = freshCatalog("eq-ddl")
    v2Table(c, "t")
    c.upsert("s", "t", Seq((2L, "B2")).toDF("id", "v"), Seq("id"))
    // renaming or dropping the key would make every read (and the
    // compact that folds the delete) throw UNRESOLVED_COLUMN — bricked
    intercept[IllegalArgumentException] { c.renameColumn("s", "t", "id", "id2") }
    intercept[IllegalArgumentException] { c.dropColumn("s", "t", "id") }
    // folding the deletes unblocks the evolution
    c.compact("s", "t")
    c.renameColumn("s", "t", "id", "id2")
    assert(c.readLatest("s", "t").schema.fieldNames.head == "id2")
  }
}
