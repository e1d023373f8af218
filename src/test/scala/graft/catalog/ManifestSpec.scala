package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manifest-tier metadata (round-8 headline): snapshots reference
  * immutable manifest files instead of inlining per-file path lists in
  * the commit log, so
  *  - the commit log grows O(1) per DML commit whatever the file count
  *    (round-7 grew O(files × snapshots) after pruned CoW decomposition),
  *  - `$files` / TRUNCATE counts are served from manifest entries — no
  *    parquet footer is reopened after commit time,
  *  - the DML probe skips files whose manifest min/max bounds PROVE no
  *    row can match, committing metadata-only no-ops with ZERO Spark
  *    jobs when bounds rule out every file.
  */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-manifest-wh"))
    c.createSchema("s")
    c
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("v", LongType)))

  private def genLogSizes(c: SnapshotCatalog, table: String): Seq[Long] = {
    val dir = new java.io.File(c.schemaLocation("s").toUri.getPath, table)
    dir.listFiles().filter(_.getName.matches("commits-\\d+\\.json"))
      .map(_.length).toSeq
  }

  private def sparkJobs(): Int =
    spark.sparkContext.statusTracker.getJobIdsForGroup(null).length

  test("commit-log growth is O(1) per DML commit on a many-file table") {
    val c = freshCatalog()
    c.createTable("s", "t", schema)
    // one insert → ~60 files
    c.insert("s", "t", (1L to 240L).map(k => (k, s"g${k % 4}", k))
      .toDF("id", "grp", "v").repartition(60))
    val nFiles = c.dataFilePaths("s", "t", c.snapshots("s", "t").last).size
    assert(nFiles >= 40, s"need a many-file table, got $nFiles files")
    val size0 = genLogSizes(c, "t").max
    // five single-row deletes, each touching one file
    val sizes = (1 to 5).map { i =>
      c.delete("s", "t", col("id") === i.toLong * 7L)
      genLogSizes(c, "t").max
    }
    // per-commit growth must be bounded by a constant (snapshot entry =
    // id + timestamp + schema + ONE manifest-list name), not O(files):
    // the round-7 shape added ~60 paths × ~60 bytes ≈ 4 KB per commit
    val deltas = (size0 +: sizes).sliding(2).map(w => w(1) - w(0)).toSeq
    assert(deltas.forall(_ < 2000),
      s"commit-log per-commit growth must be O(1), got deltas=$deltas from $size0")
    // and the data survived all five pruned rewrites
    assert(c.readLatest("s", "t").count() === 235)
  }

  test("commit log stores each distinct pinned schema ONCE (schema ids)") {
    val c = freshCatalog()
    c.createTable("s", "sch_t", schema)
    (1 to 12).foreach(i => c.insert("s", "sch_t", Seq((i.toLong, "x", i.toLong))
      .toDF("id", "grp", "v")))
    val dir = new java.io.File(c.schemaLocation("s").toUri.getPath, "sch_t")
    def latestLog(): String = {
      val f = dir.listFiles().filter(_.getName.matches("commits-\\d+\\.json"))
        .maxBy(_.getName)
      java.nio.file.Files.readString(f.toPath)
    }
    // one distinct schema over 12 snapshots → the schema JSON (its
    // escaped "fields" marker) appears exactly once in the log
    assert("fields".r.findAllIn(latestLog()).size === 1, latestLog().take(300))
    // evolution introduces a SECOND distinct schema, not 13 copies
    c.addColumn("s", "sch_t", "extra", LongType)
    c.insert("s", "sch_t", Seq((99L, "y", 9L, 1L)).toDF("id", "grp", "v", "extra"))
    assert("fields".r.findAllIn(latestLog()).size === 2)
    // round-trips: snapshot-pinned schemas still resolve per era
    assert(c.readVersion("s", "sch_t", 1L).schema.fieldNames.toSeq ===
      Seq("id", "grp", "v"))
    assert(c.readLatest("s", "sch_t").schema.fieldNames.toSeq ===
      Seq("id", "grp", "v", "extra"))
    assert(c.readLatest("s", "sch_t").count() === 13)
  }

  test("$files and TRUNCATE are served from manifests — no footer re-reads") {
    val c = freshCatalog()
    c.createTable("s", "meta_t", schema)
    c.insert("s", "meta_t", (1L to 100L).map(k => (k, "a", k))
      .toDF("id", "grp", "v").repartition(4))
    val files = c.filesMeta("s", "meta_t").filter($"content" === 0)
    assert(files.agg(sum("record_count")).as[Long].head() === 100L)
    // structural proof: physically remove one data file — the metadata
    // view still serves its record count from the manifest (a footer-
    // reading implementation would throw)
    val victim = c.dataFilePaths("s", "meta_t", c.snapshots("s", "meta_t").last).head
    val tableDir = new java.io.File(c.schemaLocation("s").toUri.getPath, "meta_t")
    assert(new java.io.File(tableDir, victim).delete(), s"could not remove $victim")
    assert(c.filesMeta("s", "meta_t").filter($"content" === 0)
      .agg(sum("record_count")).as[Long].head() === 100L,
      "record counts must come from manifest entries, not footers")
  }

  test("bounds-proven no-match DELETE commits metadata-only with ZERO Spark jobs") {
    val c = freshCatalog()
    c.createTable("s", "b_t", schema, sortedBy = Seq("id"))
    c.insert("s", "b_t", (1L to 100L).map(k => (k, "a", k)).toDF("id", "grp", "v"))
    val before = c.snapshots("s", "b_t").last
    val jobs0 = sparkJobs()
    val (snap, n) = c.deleteCounted("s", "b_t", col("id") === 10000L)
    assert(n === 0L)
    assert(sparkJobs() === jobs0,
      "bounds prove no file can hold id=10000 → no probe scan at all")
    assert(snap.manifestList === before.manifestList,
      "metadata-only no-op carries the same manifest list")
    assert(c.readLatest("s", "b_t").count() === 100)
  }

  test("bounds skip files the predicate cannot touch (sorted table, range delete)") {
    val c = freshCatalog()
    c.createTable("s", "r_t", schema, sortedBy = Seq("id"))
    // force multiple sorted files with disjoint id ranges
    val keys = Seq(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "4KB"))
    try c.insert("s", "r_t", (1L to 4000L).map(k => (k, s"g${k % 7}", k * 3))
      .toDF("id", "grp", "v"))
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    val before = c.snapshots("s", "r_t").last
    val beforePaths = c.dataFilePaths("s", "r_t", before)
    assert(beforePaths.size >= 3, s"need several sorted files, got $beforePaths")
    // delete a narrow id range: bounds confine the touched set to 1-2
    // files; every other file's manifest carries by name into the commit
    c.delete("s", "r_t", col("id") >= 10L && col("id") <= 20L)
    val after = c.snapshots("s", "r_t").last
    val afterPaths = c.dataFilePaths("s", "r_t", after).toSet
    val rewritten = beforePaths.filterNot(afterPaths)
    assert(rewritten.size <= 2,
      s"bounds must confine the rewrite to the overlapping file(s): $rewritten")
    assert(c.readLatest("s", "r_t").count() === 3989)
    assert(c.readLatest("s", "r_t").filter($"id" === 15L).count() === 0)
  }

  test("file-set filters join broadcast past the inline threshold — no O(files) In list") {
    val c = freshCatalog()
    val df = (1L to 100L).map(k => (s"file_$k", k)).toDF("f", "v")
    // large set: plan must carry a broadcast join, not a literal In
    val many = (1 to 500).map(i => s"file_$i")
    val semiPlan = c.fileSetFilter(df, "f", many, anti = false)
      .queryExecution.executedPlan.toString
    assert(semiPlan.contains("BroadcastHashJoin"), semiPlan.take(400))
    assert(!semiPlan.contains("file_250"),
      "no literal file list may appear in the plan")
    assert(c.fileSetFilter(df, "f", many, anti = false).count() === 100)
    assert(c.fileSetFilter(df, "f", many, anti = true).count() === 0)
    // small set: stays a simple In filter (cheaper than a join)
    val few = Seq("file_1", "file_2")
    val fewPlan = c.fileSetFilter(df, "f", few, anti = false)
      .queryExecution.executedPlan.toString
    assert(!fewPlan.contains("BroadcastHashJoin"))
    assert(c.fileSetFilter(df, "f", few, anti = false).count() === 2)
    assert(c.fileSetFilter(df, "f", few, anti = true).count() === 98)
    assert(c.fileSetFilter(df, "f", Nil, anti = true).count() === 100)
    assert(c.fileSetFilter(df, "f", Nil, anti = false).count() === 0)
  }

  test("manifest compaction bounds the per-snapshot manifest count") {
    val c = freshCatalog()
    c.createTable("s", "many", StructType(Seq(StructField("id", LongType))))
    (1 to 40).foreach(i => c.insert("s", "many", Seq(i.toLong).toDF("id")))
    val names = c.manifestNames("s", "many", c.snapshots("s", "many").last)
    assert(names.size <= 33, s"40 inserts must compact manifests, got ${names.size}")
    assert(c.readLatest("s", "many").count() === 40)
    assert(c.readLatest("s", "many").agg(sum("id")).as[Long].head() === 820L)
  }

  test("removeOrphanFiles reclaims unreferenced manifests but keeps live ones") {
    val c = freshCatalog()
    c.createTable("s", "orph", schema)
    c.insert("s", "orph", Seq((1L, "a", 1L)).toDF("id", "grp", "v"))
    c.delete("s", "orph", col("id") === 99L) // no-op commit, same ml carried
    val mdir = new java.io.File(
      new java.io.File(c.schemaLocation("s").toUri.getPath, "orph"), "_manifests")
    // plant debris: an unreferenced manifest (a commit-race loser's leavings)
    val debris = new java.io.File(mdir, "m-deadbeefdeadbeef.json")
    java.nio.file.Files.writeString(debris.toPath, """{"entries":[]}""")
    val removed = c.removeOrphanFiles("s", "orph")
    assert(removed.contains("_manifests/m-deadbeefdeadbeef.json"), removed.toString)
    assert(!debris.exists())
    assert(c.readLatest("s", "orph").count() === 1, "live manifests must survive")
  }

  test("expire after pruned DML reclaims untracked files and dead manifests; reads stay intact") {
    val c = freshCatalog()
    c.createTable("s", "exp", schema)
    (0 to 2).foreach(i => c.insert("s", "exp",
      (1L to 4L).map(k => (i * 10L + k, s"g$i", k)).toDF("id", "grp", "v").repartition(2)))
    c.delete("s", "exp", col("id") === 1L)
    val cutoff = c.snapshots("s", "exp").last.committedAtMillis
    c.expireSnapshots("s", "exp", cutoff)
    assert(c.readLatest("s", "exp").count() === 11)
    // every referenced file physically survives
    val tdir = new java.io.File(c.schemaLocation("s").toUri.getPath, "exp")
    val paths = c.dataFilePaths("s", "exp", c.snapshots("s", "exp").last)
    assert(paths.forall(p => new java.io.File(tdir, p).exists()))
    // and DML keeps composing after expiry
    c.updateCounted("s", "exp", Seq("v" -> lit(0L)), col("id") === 2L)
    assert(c.readLatest("s", "exp").filter($"id" === 2L)
      .select("v").as[Long].head() === 0L)
  }

  test("optimize_manifests merges the manifest set; data and CDC unchanged") {
    val c = freshCatalog()
    c.createTable("s", "om", schema)
    (1 to 6).foreach(i => c.insert("s", "om",
      Seq((i.toLong, s"g$i", i.toLong)).toDF("id", "grp", "v")))
    assert(c.manifestsMeta("s", "om").count() >= 6L)
    val sumBefore = c.readLatest("s", "om").agg(sum("v")).head.getLong(0)
    assert(c.rewriteManifests("s", "om") == 1L)
    assert(c.manifestsMeta("s", "om").count() == 1L)
    assert(c.readLatest("s", "om").agg(sum("v")).head.getLong(0) == sumBefore)
    // metadata-only: zero row-level changes across the rewrite commit
    val snaps = c.snapshots("s", "om")
    assert(c.readChanges("s", "om", snaps(snaps.length - 2).snapshotId,
      snaps.last.snapshotId).count() == 0L)
    // DML composes on the rewritten metadata
    c.delete("s", "om", col("id") === 3L)
    assert(c.readLatest("s", "om").count() == 5L)
  }

  test("manifest sharding: adoption and inserts spill past the entry cap into shards") {
    val saved = SnapshotCatalog.manifestEntryCap
    SnapshotCatalog.manifestEntryCap = 3
    try {
      val c = freshCatalog()
      // adoption path: the distributed job writes the shards in place
      val ext = tmpDir("graft-shard-ext")
      (0L until 64L).toDF("id").selectExpr("id", "'g' as grp", "id as v")
        .repartition(8).write.mode("overwrite").parquet(ext)
      c.createTable("s", "adopt", schema)
      assert(c.addFiles("s", "adopt", ext) == 8L)
      val snap = c.snapshots("s", "adopt").last
      val names = c.manifestNames("s", "adopt", snap)
      assert(names.size >= 3, s"expected >=3 shards for 8 files at cap 3, got ${names.size}")
      names.foreach(n => assert(c.manifestEntries("s", "adopt", snap)
        .size == 8)) // all entries reachable through the list
      val perShard = names.map(n =>
        Manifests.fromJson(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(c.warehouse, "s", "adopt", "_manifests", n)))).size)
      assert(perShard.forall(_ <= 3), s"a shard exceeds the cap: $perShard")
      assert(c.readLatest("s", "adopt").count() == 64L)
      // native insert path: a wide write also shards
      c.createTable("s", "ins", schema)
      c.insert("s", "ins", (0L until 64L).toDF("id")
        .selectExpr("id", "'g' as grp", "id as v").repartition(7))
      val snap2 = c.snapshots("s", "ins").last
      val names2 = c.manifestNames("s", "ins", snap2)
      assert(names2.size >= 2, s"insert of 7 files at cap 3 should shard, got ${names2.size}")
      assert(c.readLatest("s", "ins").count() == 64L)
      // migrate path
      val lake = tmpDir("graft-shard-lake")
      (0L until 64L).toDF("id").selectExpr("id", "'g' as grp", "id as v")
        .repartition(8).write.mode("overwrite").parquet(s"$lake/d")
      assert(c.migrateTable("s", "mig", s"$lake/d") == 8L)
      assert(c.manifestNames("s", "mig", c.snapshots("s", "mig").last).size >= 3)
      assert(c.readLatest("s", "mig").count() == 64L)
    } finally SnapshotCatalog.manifestEntryCap = saved
  }
}
