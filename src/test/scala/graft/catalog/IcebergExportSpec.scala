package graft.catalog

import graft.{GraftEngine, GraftQueryException, SparkSpec}
import graft.params.SqlStatement
import org.apache.hadoop.fs.Path

/** Write-side Iceberg interop: `CALL system.export_iceberg_table`
  * writes a spec-conformant v2 metadata tree (metadata.json + Avro
  * manifests with Appendix-D binary bounds re-encoded from the graft
  * manifests) referencing the graft data files in place — the reverse
  * of register_iceberg_table. Fidelity is proven by the round trip:
  * registering the export back must read identically, snapshot by
  * snapshot, and must PRUNE from the re-imported bounds.
  */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def engine(name: String): GraftEngine =
    new GraftEngine(spark, tmpDir(name))

  test("export → register back: identical reads per snapshot, bounds survive") {
    val wh = tmpDir("ice-exp-wh")
    val e = new GraftEngine(spark, wh)
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE src.t (id bigint, name varchar, score double)"))
    // two multi-row commits with disjoint id ranges (one file each)
    e.catalog.insert("src", "t",
      Seq((1L, "a", 0.5), (2L, "b", 1.5), (3L, "c", 2.5))
        .toDF("id", "name", "score").coalesce(1))
    e.catalog.insert("src", "t",
      Seq((11L, "x", 3.5), (12L, "y", 4.5))
        .toDF("id", "name", "score").coalesce(1))
    val loc = new Path(tmpDir("ice-exp-tree"))
    assert(e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 't', '${loc.toUri}')")) === 2L)
    // the tree parses as genuine Iceberg metadata with the name-mapping
    // property (id-less graft parquet resolves by name on any reader)
    val mdPath = IcebergInterop.currentMetadataPath(
      loc.getFileSystem(conf), loc)
    val mdJson = {
      val in = loc.getFileSystem(conf).open(mdPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(mdJson.contains("schema.name-mapping.default"))
    val meta = IcebergInterop.parseMetadata(mdJson)
    assert(meta.formatVersion === 2)
    assert(meta.snapshots.map(_.id) ===
      e.catalog.snapshots("src", "t").map(_.snapshotId))
    // register the export back and compare snapshot by snapshot
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'back', '${loc.toUri}')"))
    val srcSnaps = e.catalog.snapshots("src", "t").map(_.snapshotId)
    srcSnaps.foreach { id =>
      val a = e.query(SqlStatement(
        s"SELECT id, name, score FROM src.t FOR VERSION AS OF $id"))
        .as[(Long, String, Double)].collect().toSet
      val b = e.query(SqlStatement(
        s"SELECT id, name, score FROM lake.back FOR VERSION AS OF $id"))
        .as[(Long, String, Double)].collect().toSet
      assert(a === b, s"snapshot $id diverged across the round trip")
    }
    // bounds survived the round trip: corrupt the low-range file — a
    // high-range filtered read must still plan only the other file
    val lowFile = e.catalog.dataFilePaths("src", "t",
      e.catalog.snapshots("src", "t").head).head
    val lowPath = new Path(new Path(wh, "src/t"), lowFile)
    val fs2 = lowPath.getFileSystem(conf)
    val out = fs2.create(lowPath, true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    assert(e.query(SqlStatement("SELECT id FROM lake.back WHERE id >= 11"))
      .as[Long].collect().sorted.toSeq === Seq(11L, 12L))
    intercept[Exception] {
      e.query(SqlStatement("SELECT id FROM lake.back")).collect()
    }
  }

  test("delete-carrying snapshots export: positional + equality deletes round-trip") {
    val e = engine("ice-exp-del-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE src.mor (id bigint, v varchar) WITH (format_version = 2)"))
    e.catalog.insert("src", "mor",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    // a pending POSITIONAL delete (merge-on-read DELETE)...
    e.executeNonQuery(SqlStatement("DELETE FROM src.mor WHERE id = 1"))
    // ...plus a keyed UPSERT: an EQUALITY delete shadowing id 2's old
    // row, and the re-inserted id 2 itself exempt (appliesTo scoping)
    e.catalog.upsert("src", "mor",
      Seq((2L, "b2"), (4L, "d")).toDF("id", "v"), Seq("id"))
    assert(e.query(SqlStatement("SELECT id, v FROM src.mor"))
      .as[(Long, String)].collect().toSet ===
      Set((2L, "b2"), (3L, "c"), (4L, "d")))
    e.catalog.createTag("src", "mor", "pinned",
      Some(e.catalog.snapshots("src", "mor").head.snapshotId))
    val loc = new Path(tmpDir("ice-exp-del-tree"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 'mor', '${loc.toUri}')"))
    // the exported tree registers back identically, snapshot by snapshot
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'back', '${loc.toUri}')"))
    // ...and a graft tag rode the export as an Iceberg ref
    assert(e.catalog.listTags("lake", "back").get("pinned")
      .map(_.snapshotId) === e.catalog.listTags("src", "mor").get("pinned")
      .map(_.snapshotId))
    e.catalog.snapshots("src", "mor").map(_.snapshotId).foreach { id =>
      val a = e.query(SqlStatement(
        s"SELECT id, v FROM src.mor FOR VERSION AS OF $id"))
        .as[(Long, String)].collect().toSet
      val b = e.query(SqlStatement(
        s"SELECT id, v FROM lake.back FOR VERSION AS OF $id"))
        .as[(Long, String)].collect().toSet
      assert(a === b, s"snapshot $id diverged across the round trip")
    }
    // any Iceberg reader's view of the delete files: content 1 + 2
    // entries in the delete manifests, data sequence numbers scoping
    val meta = IcebergInterop.parseMetadata {
      val p = IcebergInterop.currentMetadataPath(loc.getFileSystem(conf), loc)
      val in = loc.getFileSystem(conf).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val delMans = IcebergInterop.readManifestList(conf,
      new Path(meta.snapshots.last.manifestList)).filter(_.content == 1)
    val dels = delMans.flatMap(m => IcebergInterop.readDeleteManifest(conf,
      new Path(m.path), m.seq))
    assert(dels.map(_.content).sorted === Seq(1, 2))
    assert(dels.find(_.content == 2).get.equalityIds === Seq(1))
    assert(dels.forall(_.dataSeq.isDefined))
  }

  test("graft branches export as Iceberg refs: off-main ancestry round-trips") {
    val e = engine("ice-exp-br-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    e.executeNonQuery(SqlStatement("CREATE TABLE src.t (id bigint, v varchar)"))
    e.catalog.insert("src", "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    e.catalog.createBranch("src", "t", "dev")
    e.catalog.branch("dev").insert("src", "t",
      Seq((100L, "dev")).toDF("id", "v"))
    e.catalog.insert("src", "t", Seq((3L, "c")).toDF("id", "v")) // main advances
    val loc = new Path(tmpDir("ice-exp-br-tree"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 't', '${loc.toUri}')"))
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'back', '${loc.toUri}')"))
    // main state and the branch's divergent state both survive
    assert(e.query(SqlStatement("SELECT id FROM lake.back")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 3L))
    assert(e.query(SqlStatement(
      "SELECT id FROM lake.back FOR VERSION AS OF 'dev'")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 100L))
    assert(e.query(SqlStatement(
      "SELECT id FROM src.t FOR VERSION AS OF 'dev'")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 100L))
  }

  test("export refuses identity partitioning, loudly") {
    val e = engine("ice-exp-ref-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    // identity-partitioned: partition values ride the paths, refuse
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE src.part (id bigint, region varchar) " +
        "WITH (partitioning = ARRAY['region'])"))
    e.catalog.insert("src", "part",
      Seq((1L, "eu"), (2L, "us")).toDF("id", "region"))
    val ex2 = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        s"CALL system.export_iceberg_table('src', 'part', '${tmpDir("ice-exp-part")}')"))
    }
    val msg2 = ex2.getMessage + Option(ex2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("identity-partitioned"))
  }

  test("DESCRIBE surfaces sync drift for attached tables without a refresh") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-lag"))
    val f1 = new Path(loc, "data/f1.parquet")
    val b1 = writeOneParquet(conf, withFieldIds(
      Seq((1L, "a")).toDF("id", "name"), Map("id" -> 1, "name" -> 2)), f1)
    val fr1 = FileRef(f1.toUri.toString, 1L, b1, Map.empty)
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1))))
    val e = engine("ice-lag-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    def syncRow: String = e.query(SqlStatement("DESCRIBE lake.t")).collect()
      .find(_.getString(0) == "# iceberg_sync").map(_.getString(1)).orNull
    assert(syncRow === "up to date")
    // the foreign writer commits: DESCRIBE sees the drift, no refresh
    val f2 = new Path(loc, "data/f2.parquet")
    val b2 = writeOneParquet(conf, withFieldIds(
      Seq((2L, "b")).toDF("id", "name"), Map("id" -> 1, "name" -> 2)), f2)
    val fr2 = FileRef(f2.toUri.toString, 1L, b2, Map.empty)
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1)),
        SnapRef(9002L, 1700000100000L, Seq(fr1, fr2))))
    assert(syncRow === "behind by 1 snapshot(s)")
    e.executeNonQuery(SqlStatement("CALL system.refresh_iceberg_table('lake', 't')"))
    assert(syncRow === "up to date")
  }
}
