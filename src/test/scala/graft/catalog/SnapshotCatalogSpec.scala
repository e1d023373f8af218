package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Snapshot / time-travel contract, ported from the reference's time-travel
  * integration test (reference tests/IntegrationTests/AthenaClientTests
  * .cs:348-391): two INSERT commits with a captured instant between them; a
  * `FOR TIMESTAMP AS OF` read at that instant sees only commit 1, composed
  * with WHERE and ORDER BY.
  */
class SnapshotCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-wh"))
    c.createSchema("common_test_data")
    c
  }

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("event_time", TimestampType)))

  test("create/exists/drop table lifecycle (S2, S3, S6)") {
    val c = freshCatalog()
    c.createTable("common_test_data", "t1", eventsSchema)
    assert(c.tableExists("common_test_data", "t1"))
    intercept[IllegalStateException] {
      c.createTable("common_test_data", "t1", eventsSchema)
    }
    c.createTable("common_test_data", "t1", eventsSchema, ifNotExists = true) // no-op
    c.dropTable("common_test_data", "t1")
    assert(!c.tableExists("common_test_data", "t1"))
  }

  test("empty table reads as zero rows with declared schema") {
    val c = freshCatalog()
    c.createTable("common_test_data", "empty_t", eventsSchema)
    val df = c.readLatest("common_test_data", "empty_t")
    assert(df.count() == 0)
    assert(df.schema == eventsSchema)
  }

  test("each INSERT is a snapshot; latest read sees the union (S5)") {
    val c = freshCatalog()
    c.createTable("common_test_data", "events_tt", eventsSchema)
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    c.insert("common_test_data", "events_tt",
      Seq((1L, "login", t), (2L, "click", t)).toDF("event_id", "event_type", "event_time"))
    c.insert("common_test_data", "events_tt",
      Seq((3L, "purchase", t), (4L, "logout", t)).toDF("event_id", "event_type", "event_time"))
    assert(c.snapshots("common_test_data", "events_tt").map(_.snapshotId) == Seq(1L, 2L))
    assert(c.readLatest("common_test_data", "events_tt").count() == 4)
  }

  test("FOR TIMESTAMP AS OF between commits sees only commit 1 (AthenaClientTests.cs:374-391)") {
    val c = freshCatalog()
    c.createTable("common_test_data", "events_time_travel", eventsSchema)
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val s1 = c.insert("common_test_data", "events_time_travel",
      Seq((1L, "login", t), (2L, "click", t)).toDF("event_id", "event_type", "event_time"))
    val between = s1.committedAtMillis // instant of commit 1, before commit 2
    val s2 = c.insert("common_test_data", "events_time_travel",
      Seq((3L, "purchase", t), (4L, "logout", t)).toDF("event_id", "event_type", "event_time"))
    assert(s2.committedAtMillis > between)

    // composes with WHERE + ORDER BY like the reference query
    val got = c.readAsOf("common_test_data", "events_time_travel", between)
      .filter($"event_id" > 0).orderBy($"event_id")
      .select("event_id", "event_type").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "login"), (2L, "click")))

    // at/after commit 2 → all four
    assert(c.readAsOf("common_test_data", "events_time_travel",
      s2.committedAtMillis).count() == 4)
    // before the first commit → empty with declared schema
    val before = c.readAsOf("common_test_data", "events_time_travel", 0L)
    assert(before.count() == 0)
    assert(before.schema == eventsSchema)
  }

  test("commit timestamps are strictly monotonic even for rapid commits") {
    val c = freshCatalog()
    c.createTable("common_test_data", "rapid", StructType(Seq(StructField("x", IntegerType))))
    val snaps = (1 to 5).map(i =>
      c.insert("common_test_data", "rapid", Seq(i).toDF("x")))
    val times = snaps.map(_.committedAtMillis)
    assert(times == times.sorted && times.distinct.size == times.size)
  }

  test("merge upserts by key with copy-on-write history (MERGE INTO equivalent)") {
    val c = freshCatalog()
    c.createTable("common_test_data", "merge_t", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    val s1 = c.insert("common_test_data", "merge_t",
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    c.merge("common_test_data", "merge_t",
      Seq((2, "B2"), (4, "d")).toDF("id", "v"), key = "id")
    val now = c.readLatest("common_test_data", "merge_t")
      .orderBy($"id").as[(Int, String)].collect().toSeq
    assert(now == Seq((1, "a"), (2, "B2"), (3, "c"), (4, "d")))
    // pre-merge history intact via time travel
    val before = c.readAsOf("common_test_data", "merge_t", s1.committedAtMillis)
      .orderBy($"id").as[(Int, String)].collect().toSeq
    assert(before == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("delete removes matching rows as a rewrite commit (DELETE FROM equivalent)") {
    val c = freshCatalog()
    c.createTable("common_test_data", "del_t", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    // one multi-row file, so `id = 2` covers it PARTIALLY and the delete
    // must rewrite (a fully-covered file would leave by metadata instead —
    // SqlDmlSpec pins that contract)
    c.insert("common_test_data", "del_t",
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v").coalesce(1))
    val snap = c.delete("common_test_data", "del_t",
      org.apache.spark.sql.functions.col("id") === 2)
    // file-pruned CoW: the commit holds a rewrite dir for the touched
    // file(s); untouched files may carry by manifest reference
    // (PrunedRewriteSpec pins the exact pruning contract)
    assert(c.dataFilePaths("common_test_data", "del_t", snap)
      .exists(_.contains("-rewrite")))
    assert(snap.operation.contains("overwrite"))
    assert(c.readLatest("common_test_data", "del_t")
      .orderBy($"id").as[(Int, String)].collect().toSeq == Seq((1, "a"), (3, "c")))
    // rewrite + expiry reclaims the pre-delete files
    c.expireSnapshots("common_test_data", "del_t", snap.committedAtMillis)
    assert(c.readLatest("common_test_data", "del_t").count() == 2)
  }

  test("merge rejects duplicate update keys (Iceberg multiple-match contract)") {
    val c = freshCatalog()
    c.createTable("common_test_data", "mdup_t", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    c.insert("common_test_data", "mdup_t", Seq((1, "a")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException] {
      c.merge("common_test_data", "mdup_t",
        Seq((4, "d1"), (4, "d2")).toDF("id", "v"), key = "id")
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("expireSnapshots trims history but keeps latest data (expire-snapshots config surface)") {
    val c = freshCatalog()
    c.createTable("common_test_data", "exp_t", StructType(Seq(StructField("x", IntegerType))))
    val s1 = c.insert("common_test_data", "exp_t", Seq(1).toDF("x"))
    val s2 = c.insert("common_test_data", "exp_t", Seq(2).toDF("x"))
    val expired = c.expireSnapshots("common_test_data", "exp_t", s2.committedAtMillis)
    assert(expired == Seq(s1.snapshotId))
    // latest read intact
    assert(c.readLatest("common_test_data", "exp_t").count() == 2)
    // history before the surviving snapshot is gone → empty table
    assert(c.readAsOf("common_test_data", "exp_t", s1.committedAtMillis).count() == 0)
    // expiring everything keeps at least the latest
    assert(c.expireSnapshots("common_test_data", "exp_t", Long.MaxValue) == Nil)
    assert(c.readLatest("common_test_data", "exp_t").count() == 2)
  }

  test("removeOrphanFiles deletes unreferenced debris only (remove-orphan-files surface)") {
    val c = freshCatalog()
    c.createTable("common_test_data", "orph_t", StructType(Seq(StructField("x", IntegerType))))
    c.insert("common_test_data", "orph_t", Seq(1, 2).toDF("x"))
    // plant failed-write debris
    val tdir = java.nio.file.Paths.get(c.warehouse, "common_test_data", "orph_t")
    java.nio.file.Files.createDirectory(tdir.resolve("snap-99999-aborted"))
    java.nio.file.Files.write(tdir.resolve("stray.tmp"), "x".getBytes)
    val removed = c.removeOrphanFiles("common_test_data", "orph_t")
    assert(removed.toSet == Set("snap-99999-aborted", "stray.tmp"))
    assert(c.readLatest("common_test_data", "orph_t").count() == 2)
    assert(c.removeOrphanFiles("common_test_data", "orph_t") == Nil)
  }

  test("CTAS returns row count (S4, AthenaClient.cs:152-160)") {
    val c = freshCatalog()
    val n = c.createTableAs("common_test_data", "ctas_t",
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    assert(n == 3)
    assert(c.readLatest("common_test_data", "ctas_t").count() == 3)
  }

  test("addColumn evolves the schema; old snapshots read NULL for new columns") {
    val c = freshCatalog()
    c.createTable("common_test_data", "evolve_t", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))
    c.insert("common_test_data", "evolve_t", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val preEvolution = c.snapshots("common_test_data", "evolve_t").last.committedAtMillis

    c.addColumn("common_test_data", "evolve_t", "score", DoubleType)
    intercept[IllegalArgumentException] {
      c.addColumn("common_test_data", "evolve_t", "NAME", StringType) // case-insensitive dup
    }
    c.insert("common_test_data", "evolve_t",
      Seq((3L, "c", 0.5)).toDF("id", "name", "score"))

    val latest = c.readLatest("common_test_data", "evolve_t")
    assert(latest.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    val rows = latest.select($"id", $"score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(0.5)))

    // time travel to before the evolution presents the schema AS OF that
    // snapshot (Iceberg snapshot-schema semantics): no `score` column at
    // all, rather than a NULL-filled one
    val asOf = c.readAsOf("common_test_data", "evolve_t", preEvolution)
    assert(asOf.count() == 2)
    assert(asOf.schema.fieldNames.toSeq == Seq("id", "name"))

    // ...while a time-travel read AFTER the evolution (and after the new
    // insert) sees the evolved schema, NULL-filled for old files
    val post = c.snapshots("common_test_data", "evolve_t").last.committedAtMillis
    val asOfPost = c.readAsOf("common_test_data", "evolve_t", post)
    assert(asOfPost.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(asOfPost.filter($"score".isNotNull).count() == 1)
  }

  test("delete honors SQL three-valued logic: NULL predicates keep the row") {
    val c = freshCatalog()
    c.createTable("common_test_data", "del3vl", StructType(Seq(
      StructField("id", LongType), StructField("x", IntegerType))))
    c.insert("common_test_data", "del3vl",
      spark.createDataFrame(
        java.util.List.of(
          org.apache.spark.sql.Row(1L, Integer.valueOf(10)),
          org.apache.spark.sql.Row(2L, null),
          org.apache.spark.sql.Row(3L, Integer.valueOf(3))),
        StructType(Seq(StructField("id", LongType), StructField("x", IntegerType)))))
    import org.apache.spark.sql.functions.col
    c.delete("common_test_data", "del3vl", col("x") > 5)
    // id=1 (x=10) deleted; id=2 (x NULL -> predicate UNKNOWN) kept; id=3 kept
    val left = c.readLatest("common_test_data", "del3vl")
      .select("id").as[Long].collect().sorted.toSeq
    assert(left == Seq(2L, 3L))
  }

  test("partitioned table: filtered reads prune to matching partition dirs (Iceberg partitioning)") {
    import org.apache.spark.sql.functions.col
    val c = freshCatalog()
    c.createTable("common_test_data", "pt", StructType(Seq(
      StructField("id", LongType), StructField("category", StringType))),
      partitionedBy = Seq("category"))
    assert(c.partitionSpec("common_test_data", "pt") == Seq("category"))
    c.insert("common_test_data", "pt",
      Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "category"))
    c.insert("common_test_data", "pt", Seq((4L, "c")).toDF("id", "category"))
    // data lands in hive-layout category=… dirs inside each snap dir
    val snap1 = new java.io.File(c.schemaLocation("common_test_data").toUri.getPath, "pt")
      .listFiles().find(_.getName.startsWith("_snap=00001")).get
    assert(snap1.listFiles().exists(_.getName == "category=a"), snap1.listFiles().mkString(","))
    val q = c.readLatest("common_test_data", "pt").filter(col("category") === "a")
    assert(q.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // the partition predicate must reach the scan as a PartitionFilter —
    // pruned before any file is opened
    q.collect()
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("category"),
      plan.take(600))
    // structural proof: destroy the category=b files; the a-filtered read
    // still works because b's directories are never opened
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(snap1, "category=b"))
    assert(c.readLatest("common_test_data", "pt").filter(col("category") === "a")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // time travel composes with partitioning: commit-1 view only
    val s1 = c.snapshots("common_test_data", "pt").head
    assert(c.readAsOf("common_test_data", "pt", s1.committedAtMillis)
      .filter(col("category") === "a")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("snapshot-read plan size is O(1) in commit count (partitioned table)") {
    import org.apache.spark.sql.functions.col
    val c = freshCatalog()
    c.createTable("common_test_data", "many_commits", StructType(Seq(
      StructField("id", LongType), StructField("category", StringType))),
      partitionedBy = Seq("category"))
    def planNodes(n: Int): Int = {
      (c.snapshots("common_test_data", "many_commits").size until n).foreach { i =>
        c.insert("common_test_data", "many_commits",
          Seq((i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "category"))
      }
      val df = c.readLatest("common_test_data", "many_commits")
      assert(df.count() == n.toLong)
      df.queryExecution.optimizedPlan.collect { case p => p }.size
    }
    val small = planNodes(2)
    val large = planNodes(50) // 50 commits → 50 snap dirs in ONE scan node
    assert(large == small,
      s"plan grew with commit count: $small nodes at 2 commits, $large at 50")
    // partition pruning still applies across all 50 roots
    val q = c.readLatest("common_test_data", "many_commits")
      .filter(col("category") === "a")
    assert(q.count() == 25L)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("category"))
    // time travel still resolves mid-history
    val s3 = c.snapshots("common_test_data", "many_commits")(2)
    assert(c.readAsOf("common_test_data", "many_commits", s3.committedAtMillis)
      .count() == 3L)
  }

  test("partition column must exist in the declared schema") {
    val c = freshCatalog()
    intercept[IllegalArgumentException] {
      c.createTable("common_test_data", "badpt", StructType(Seq(
        StructField("id", LongType))), partitionedBy = Seq("nope"))
    }
  }

  test("schema custom location is honored and survives a fresh catalog instance (01-schema.sql:2)") {
    val wh = tmpDir("loc-wh")
    val loc = tmpDir("loc-ext") + "/custom_schema_home"
    val c = new SnapshotCatalog(spark, wh)
    c.createSchema("located", Some(loc))
    c.createTable("located", "t", StructType(Seq(StructField("id", LongType))))
    c.insert("located", "t", Seq(1L, 2L).toDF("id"))
    assert(new java.io.File(s"$loc/t/commits.json").exists())
    assert(!new java.io.File(s"$wh/located/t").exists())
    // a separate catalog instance (fresh cache) resolves the same location
    val c2 = new SnapshotCatalog(spark, wh)
    assert(c2.readLatest("located", "t").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
