package graft.catalog

import graft.{GraftEngine, GraftQueryException, SparkSpec}
import graft.params.SqlStatement
import org.apache.hadoop.fs.Path

import scala.jdk.CollectionConverters._

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

  test("identity-partitioned export: partition spec + per-file structs round-trip") {
    val wh = tmpDir("ice-exp-part-wh")
    val e = new GraftEngine(spark, wh)
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE src.part (id bigint, region varchar) " +
        "WITH (partitioning = ARRAY['region'])"))
    e.catalog.insert("src", "part",
      Seq((1L, "eu"), (2L, "eu"), (11L, "us")).toDF("id", "region"))
    e.catalog.insert("src", "part", Seq((12L, "us")).toDF("id", "region"))
    val loc = new Path(tmpDir("ice-exp-part-tree"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 'part', '${loc.toUri}')"))
    // the exported metadata declares the identity spec, and every data
    // manifest entry carries the partition struct value
    val meta = IcebergInterop.parseMetadata {
      val p = IcebergInterop.currentMetadataPath(loc.getFileSystem(conf), loc)
      val in = loc.getFileSystem(conf).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(meta.specFields ===
      Seq(IcebergInterop.IceSpecField("region", "identity", 2)))
    // register back: the data files don't store `region` — the spec's
    // Column Projection rule fills it from the partition structs
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'back', '${loc.toUri}')"))
    e.catalog.snapshots("src", "part").map(_.snapshotId).foreach { id =>
      val a = e.query(SqlStatement(
        s"SELECT id, region FROM src.part FOR VERSION AS OF $id"))
        .as[(Long, String)].collect().toSet
      val b = e.query(SqlStatement(
        s"SELECT id, region FROM lake.back FOR VERSION AS OF $id"))
        .as[(Long, String)].collect().toSet
      assert(a === b, s"snapshot $id diverged across the round trip")
    }
    // $partitions parity across the round trip
    def parts(t: String) = e.query(SqlStatement(
      s"""SELECT partition, record_count FROM $t ORDER BY partition"""))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(parts("""lake."back$partitions"""") ===
      parts("""src."part$partitions""""))
    assert(parts("""lake."back$partitions"""").map(_._2).sum === 4L)
    // partition-pruned reads: corrupt one us file — an eu-filtered read
    // on the RE-IMPORTED table must never open it
    val usFile = e.catalog.dataFilePaths("src", "part",
      e.catalog.snapshots("src", "part").last)
      .find(_.contains("region=us")).get
    val usPath = new Path(new Path(wh, "src/part"), usFile)
    val out = usPath.getFileSystem(conf).create(usPath, true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    assert(e.query(SqlStatement(
      "SELECT id FROM lake.back WHERE region = 'eu'"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("identity export: date-typed and null partition values round-trip") {
    val e = engine("ice-exp-date-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE src.days (id bigint, d date) " +
        "WITH (partitioning = ARRAY['d'])"))
    e.catalog.insert("src", "days",
      Seq((1L, java.sql.Date.valueOf("2024-01-15")),
        (2L, java.sql.Date.valueOf("2024-02-20"))).toDF("id", "d"))
    e.catalog.insert("src", "days",
      Seq((3L, null.asInstanceOf[java.sql.Date])).toDF("id", "d"))
    val loc = new Path(tmpDir("ice-exp-date-tree"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 'days', '${loc.toUri}')"))
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'back', '${loc.toUri}')"))
    assert(e.query(SqlStatement(
      "SELECT id, CAST(d AS STRING) FROM lake.back"))
      .as[(Long, String)].collect().toSet ===
      Set((1L, "2024-01-15"), (2L, "2024-02-20"), (3L, null)))
    assert(e.query(SqlStatement(
      "SELECT id FROM lake.back WHERE d = DATE '2024-02-20'"))
      .as[Long].collect().toSeq === Seq(2L))
    assert(e.query(SqlStatement(
      "SELECT id FROM lake.back WHERE d IS NULL"))
      .as[Long].collect().toSeq === Seq(3L))
  }

  test("transform-partitioned export: month/truncate specs with epoch-ordinal values") {
    val e = engine("ice-exp-tr-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE src.ev (id bigint, ts timestamp(6) with time zone) " +
        "WITH (partitioning = ARRAY['month(ts)'])"))
    e.catalog.insert("src", "ev", Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-03-15T10:00:00Z"))),
      (2L, java.sql.Timestamp.from(java.time.Instant.parse("2024-04-01T00:00:00Z"))))
      .toDF("id", "ts"))
    val loc = new Path(tmpDir("ice-exp-tr-tree"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 'ev', '${loc.toUri}')"))
    val meta = IcebergInterop.parseMetadata {
      val p = IcebergInterop.currentMetadataPath(loc.getFileSystem(conf), loc)
      val in = loc.getFileSystem(conf).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(meta.specFields ===
      Seq(IcebergInterop.IceSpecField("ts_month", "month", 2)))
    // the manifest partition struct carries the SPEC's epoch ordinals:
    // 2024-03 = (2024-1970)*12 + 2 = 650, 2024-04 = 651 — read the raw
    // Avro, independent of the import path
    val man = IcebergInterop.readManifestList(conf,
      new Path(meta.snapshots.last.manifestList)).filter(_.content == 0)
    val ordinals = man.flatMap { m =>
      val in = new Path(m.path).getFileSystem(conf).open(new Path(m.path))
      val r = new org.apache.avro.file.DataFileStream(in,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try r.iterator().asScala.map { rec =>
        rec.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("ts_month").asInstanceOf[Int]
      }.toList
      finally r.close()
    }
    assert(ordinals.sorted === Seq(650, 651))
    // round trip: the re-imported table reads identically
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'back', '${loc.toUri}')"))
    assert(e.query(SqlStatement("SELECT id FROM lake.back")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L))
    // integral TRUNCATE exports with pass-through floor values
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE src.tr (id bigint, v varchar) " +
        "WITH (partitioning = ARRAY['truncate(10, id)'])"))
    e.catalog.insert("src", "tr", Seq((7L, "a"), (23L, "b")).toDF("id", "v"))
    val loc2 = new Path(tmpDir("ice-exp-tr2-tree"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 'tr', '${loc2.toUri}')"))
    val meta2 = IcebergInterop.parseMetadata {
      val p = IcebergInterop.currentMetadataPath(loc2.getFileSystem(conf), loc2)
      val in = loc2.getFileSystem(conf).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(meta2.specFields ===
      Seq(IcebergInterop.IceSpecField("id_trunc_10", "truncate[10]", 1)))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'tr', '${loc2.toUri}')"))
    assert(e.query(SqlStatement("SELECT id FROM lake.tr")).as[Long]
      .collect().sorted.toSeq === Seq(7L, 23L))
  }

  test("foreign time-transform partition values fold into conservative source bounds") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-trfold"))
    // a month-partitioned foreign tree whose manifests carry NO column
    // bounds — the month ordinal is the only pruning information
    val f1 = new Path(loc, "data/f1.parquet")
    val f2 = new Path(loc, "data/f2.parquet")
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val b1 = writeOneParquet(conf, withFieldIds(
      Seq((1L, ts("2024-03-15T10:00:00Z"))).toDF("id", "ts"),
      Map("id" -> 1, "ts" -> 2)), f1)
    val b2 = writeOneParquet(conf, withFieldIds(
      Seq((2L, ts("2024-04-02T00:00:00Z"))).toDF("id", "ts"),
      Map("id" -> 1, "ts" -> 2)), f2)
    val fr1 = FileRef(f1.toUri.toString, 1L, b1, Map.empty,
      partition = Seq("ts_month" -> 650)) // 2024-03
    val fr2 = FileRef(f2.toUri.toString, 1L, b2, Map.empty,
      partition = Seq("ts_month" -> 651)) // 2024-04
    writeTreeWithCurrent(conf, loc,
      Seq((1, "id", "long"), (2, "ts", "timestamptz")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1, fr2))),
      currentId = 9001L, formatVersion = 2,
      specFields = Seq(("ts_month", "month", 2)),
      partAvroTypes = Seq(("ts_month", "int")))
    val e = engine("ice-trfold-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L))
    // corrupt the April file: a March-bounded read must never open it —
    // only the folded month range can prove that (no column bounds)
    val out = f2.getFileSystem(conf).create(f2, true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    assert(e.query(SqlStatement(
      "SELECT id FROM lake.t WHERE ts < TIMESTAMP '2024-03-20 00:00:00 UTC'"))
      .as[Long].collect().toSeq === Seq(1L))
  }

  test("nested types export: struct/list/map columns round-trip") {
    import org.apache.spark.sql.functions._
    val e = engine("ice-exp-nest-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    // the multimodal table shape: a struct column + a list + a map
    val df = Seq(
      (1L, (640, 480), Seq("a", "b"), Map("k1" -> 1.5)),
      (2L, (800, 600), Seq("c"), Map("k2" -> 2.5)))
      .toDF("id", "dims", "tags", "scores")
      .select(col("id"),
        col("dims").cast("struct<w:int,h:int>").as("dims"),
        col("tags"), col("scores"))
    e.catalog.createTable("src", "m", df.schema)
    e.catalog.insert("src", "m", df)
    val loc = new Path(tmpDir("ice-exp-nest-tree"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 'm', '${loc.toUri}')"))
    // the metadata declares the nested types with UNIQUE nested field
    // ids and a nested name mapping
    val mdJson = {
      val p = IcebergInterop.currentMetadataPath(loc.getFileSystem(conf), loc)
      val in = loc.getFileSystem(conf).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val meta = IcebergInterop.parseMetadata(mdJson)
    assert(meta.schema.fieldNames.toSeq === Seq("id", "dims", "tags", "scores"))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(mdJson)
    def collectIds(n: com.fasterxml.jackson.databind.JsonNode): Seq[Int] =
      if (n == null) Nil
      else (Seq("id", "element-id", "key-id", "value-id")
        .flatMap(k => Option(n.get(k)).filter(_.isInt).map(_.asInt))) ++
        (n.elements().asScala.flatMap(collectIds).toSeq)
    val allIds = collectIds(root.get("schemas"))
    assert(allIds.distinct.size === allIds.size, "nested field ids collide")
    assert(root.get("last-column-id").asInt === allIds.max)
    assert(root.get("properties").get("schema.name-mapping.default")
      .asText.contains("\"element\""))
    // register back: nested values must round-trip
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'back', '${loc.toUri}')"))
    val got = e.query(SqlStatement(
      "SELECT id, dims.w, dims.h, tags, scores['k1'] FROM lake.back"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getSeq[String](3).toList, Option(r.get(4)))).toSet
    assert(got === Set(
      (1L, 640, 480, List("a", "b"), Some(1.5)),
      (2L, 800, 600, List("c"), None)))
    // incremental re-export after ADD COLUMN would re-derive the nested
    // field ids (a new top-level id collides with an old nested one) —
    // Iceberg ids must never be reused, so that shape refuses loudly
    e.executeNonQuery(SqlStatement("ALTER TABLE src.m ADD COLUMN extra bigint"))
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        s"CALL system.export_iceberg_table('src', 'm', '${loc.toUri}')"))
    }
    val m2 = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(m2.contains("nested"), s"expected the nested-id refusal: $m2")
  }

  test("ANALYZE stats ride the export/register round trip metadata-only") {
    val wh = tmpDir("ice-exp-stats-wh")
    val e = new GraftEngine(spark, wh)
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    e.executeNonQuery(SqlStatement("CREATE TABLE src.t (id bigint, v varchar)"))
    e.catalog.insert("src", "t",
      Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
        .toDF("id", "v"))
    e.executeNonQuery(SqlStatement("ANALYZE src.t"))
    val srcStats = e.query(SqlStatement("SHOW STATS FOR src.t")).collect()
      .map(_.toSeq).toSet
    val loc = new Path(tmpDir("ice-exp-stats-tree"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 't', '${loc.toUri}')"))
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'back', '${loc.toUri}')"))
    // the persisted stats restored at register: SHOW STATS parity
    // WITHOUT a scan — corrupt the data file first so any scan would
    // throw, proving the serve is metadata-only
    val dataFile = e.catalog.dataFilePaths("src", "t",
      e.catalog.snapshots("src", "t").last).head
    val p = new Path(new Path(wh, "src/t"), dataFile)
    val out = p.getFileSystem(conf).create(p, true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    val backStats = e.query(SqlStatement("SHOW STATS FOR lake.back")).collect()
      .map(_.toSeq).toSet
    assert(backStats === srcStats)
  }

  test("incremental re-export: new commits append as a metadata advance") {
    val e = engine("ice-exp-inc-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE src.t (id bigint, v varchar) WITH (format_version = 2)"))
    e.catalog.insert("src", "t", Seq((1L, "a")).toDF("id", "v"))
    val loc = new Path(tmpDir("ice-exp-inc-tree"))
    assert(e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 't', '${loc.toUri}')")) === 1L)
    val fsys = loc.getFileSystem(conf)
    val uuid1 = {
      val in = fsys.open(IcebergInterop.currentMetadataPath(fsys, loc))
      val j = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(j)
        .get("table-uuid").asText
    }
    // a foreign reader attaches the v1 export and polls it
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'poll', '${loc.toUri}')"))
    // the table commits twice more — one of them a MoR delete, so a
    // carried delete state crosses the re-export boundary
    e.catalog.insert("src", "t", Seq((2L, "b"), (3L, "c")).toDF("id", "v"))
    e.executeNonQuery(SqlStatement("DELETE FROM src.t WHERE id = 2"))
    // re-export onto the SAME location: only the delta exports
    assert(e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 't', '${loc.toUri}')")) === 2L)
    val md2 = IcebergInterop.currentMetadataPath(fsys, loc)
    assert(md2.getName === "v2.metadata.json")
    val j2 = {
      val in = fsys.open(md2)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    // lineage preserved: same table-uuid, all three snapshots listed
    assert(new com.fasterxml.jackson.databind.ObjectMapper().readTree(j2)
      .get("table-uuid").asText === uuid1)
    val meta2 = IcebergInterop.parseMetadata(j2)
    assert(meta2.snapshots.map(_.id) ===
      e.catalog.snapshots("src", "t").map(_.snapshotId))
    // the polling foreign reader refreshes and sees the new commits
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 'poll')")) === 2L)
    assert(e.query(SqlStatement("SELECT id FROM lake.poll")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L))
    e.catalog.snapshots("src", "t").map(_.snapshotId).foreach { id =>
      val a = e.query(SqlStatement(
        s"SELECT id, v FROM src.t FOR VERSION AS OF $id"))
        .as[(Long, String)].collect().toSet
      val b = e.query(SqlStatement(
        s"SELECT id, v FROM lake.poll FOR VERSION AS OF $id"))
        .as[(Long, String)].collect().toSet
      assert(a === b, s"snapshot $id diverged after the incremental export")
    }
    // a THIRD export with nothing new: metadata advances, 0 exported
    assert(e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 't', '${loc.toUri}')")) === 0L)
    assert(IcebergInterop.currentMetadataPath(fsys, loc).getName ===
      "v3.metadata.json")
  }

  test("incremental re-export refuses a foreign location and rewritten history") {
    val e = engine("ice-exp-incref-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    e.executeNonQuery(SqlStatement("CREATE TABLE src.a (id bigint)"))
    e.executeNonQuery(SqlStatement("CREATE TABLE src.b (id bigint)"))
    e.catalog.insert("src", "a", Seq(1L).toDF("id"))
    e.catalog.insert("src", "b", Seq(2L).toDF("id"))
    val loc = new Path(tmpDir("ice-exp-incref-tree"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.export_iceberg_table('src', 'a', '${loc.toUri}')"))
    // a DIFFERENT table cannot export onto a's tree
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        s"CALL system.export_iceberg_table('src', 'b', '${loc.toUri}')"))
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("not an export of"))
    // expiry rewrites a's history past the export: refuse, don't corrupt
    e.catalog.insert("src", "a", Seq(3L).toDF("id"))
    e.catalog.expireSnapshots("src", "a", System.currentTimeMillis() + 60000L)
    val ex2 = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        s"CALL system.export_iceberg_table('src', 'a', '${loc.toUri}')"))
    }
    val msg2 = ex2.getMessage + Option(ex2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("not a prefix"))
  }

  test("export refuses a tag/branch ref-name collision, loudly") {
    val e = engine("ice-exp-refcol-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA src"))
    e.executeNonQuery(SqlStatement("CREATE TABLE src.t (id bigint)"))
    e.catalog.insert("src", "t", Seq(1L).toDF("id"))
    // a tag and a branch sharing a name: Iceberg `refs` is ONE
    // namespace — exporting would silently drop the tag
    e.catalog.createTag("src", "t", "release", None)
    e.catalog.createBranch("src", "t", "release")
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        s"CALL system.export_iceberg_table('src', 't', '${tmpDir("ice-exp-refcol")}')"))
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("one namespace") || msg.contains("rename one side"))
    // (a ref named `main` needs no export-side case: refNameOk already
    // refuses it at tag/branch creation — the export guard is defensive)
  }

  test("column-projection attach: unreconstructible values refuse at register AND refresh") {
    import IcebergFixture._
    // a foreign identity-partitioned tree whose data files DON'T store
    // the identity column (the Column Projection shape) and whose
    // partition value is a >64-char string: the bounds tier drops it
    // (MaxStringBound) and the path holds no hive segment — a read
    // would silently NULL, so the attach must refuse loudly
    val longVal = "x" * 80
    def tree(name: String, snaps: Int, badLast: Boolean): Path = {
      val loc = new Path(tmpDir(name))
      val refs = (1 to snaps).map { i =>
        val f = new Path(loc, f"data/f$i%02d.parquet")
        val b = writeOneParquet(conf, withFieldIds(
          Seq((i.toLong, 1.0)).toDF("id", "score"), Map("id" -> 1, "score" -> 3)), f)
        val pv = if (badLast && i == snaps) longVal else s"p$i"
        FileRef(f.toUri.toString, 1L, b,
          Map(1 -> (encodeLong(i.toLong), encodeLong(i.toLong), 0L)),
          partition = Seq("region" -> pv))
      }
      (1 to snaps).foldLeft(Seq.empty[SnapRef]) { (acc, i) =>
        acc :+ SnapRef(9000L + i, 1700000000000L + i * 1000L,
          refs.take(i), seq = Some(i.toLong))
      } match {
        case all => writeTree(conf, loc, 2,
          Seq((1, "id", "long"), (2, "region", "string"), (3, "score", "double")),
          all, specFields = Seq(("region", "identity", 2)),
          partAvroTypes = Seq(("region", "string")))
      }
      loc
    }
    val e = engine("ice-proj-ref-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    // register-time refusal
    val bad = tree("ice-proj-bad", 2, badLast = true)
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        s"CALL system.register_iceberg_table('lake', 'b', '${bad.toUri}')"))
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("stores no identity column"))
    assert(!e.catalog.tableExists("lake", "b"))
    // refresh-time refusal: a GOOD projection tree attaches (and reads
    // the projected values), then the foreign writer commits the bad file
    val loc = tree("ice-proj-good", 1, badLast = false)
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 'g', '${loc.toUri}')"))
    assert(e.query(SqlStatement("SELECT id, region FROM lake.g"))
      .as[(Long, String)].collect().toSet === Set((1L, "p1")))
    // rebuild the same location with a bad second snapshot
    locally {
      val f2 = new Path(loc, "data/f02.parquet")
      val b2 = writeOneParquet(conf, withFieldIds(
        Seq((2L, 1.0)).toDF("id", "score"), Map("id" -> 1, "score" -> 3)), f2)
      val f1 = new Path(loc, "data/f01.parquet")
      val fr1 = FileRef(f1.toUri.toString, 1L,
        f1.getFileSystem(conf).getFileStatus(f1).getLen,
        Map(1 -> (encodeLong(1L), encodeLong(1L), 0L)),
        partition = Seq("region" -> "p1"))
      val fr2 = FileRef(f2.toUri.toString, 1L, b2,
        Map(1 -> (encodeLong(2L), encodeLong(2L), 0L)),
        partition = Seq("region" -> longVal))
      writeTree(conf, loc, 2,
        Seq((1, "id", "long"), (2, "region", "string"), (3, "score", "double")),
        Seq(SnapRef(9001L, 1700000001000L, Seq(fr1), seq = Some(1L)),
          SnapRef(9002L, 1700000002000L, Seq(fr1, fr2), seq = Some(2L))),
        specFields = Seq(("region", "identity", 2)),
        partAvroTypes = Seq(("region", "string")))
    }
    val ex2 = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        "CALL system.refresh_iceberg_table('lake', 'g')"))
    }
    val msg2 = ex2.getMessage + Option(ex2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("stores no identity column"),
      s"refresh did not refuse the unreconstructible value: $msg2")
    // the table stays at its pre-refresh state, still readable
    assert(e.query(SqlStatement("SELECT id FROM lake.g")).as[Long]
      .collect().toSeq === Seq(1L))
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
