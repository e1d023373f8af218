package graft.catalog

import graft.{GraftEngine, GraftQueryException, SparkSpec}
import graft.params.SqlStatement
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Read-only Iceberg-format interop: `CALL system.register_iceberg_table`
  * parses a genuine v1/v2 metadata.json + Avro manifest tree
  * ([[IcebergInterop]]) into the engine's snapshot model. The fixture
  * ([[IcebergFixture]]) writes the real on-disk shapes — Avro manifest
  * lists/manifests with k/v-array maps and binary single-value bounds —
  * independently of the reader, so these are format tests, not
  * round-trips of the reader's own output.
  */
class IcebergInteropSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  /** Write `df` as ONE parquet file at exactly `target` with real
    * Iceberg-writer field ids (id → 1, name → 2, extra → 4, the same
    * map every tree in this spec declares); returns bytes.
    */
  private def writeParquet(df: org.apache.spark.sql.DataFrame, target: Path): Long =
    IcebergFixture.writeOneParquet(conf, IcebergFixture.withFieldIds(df,
      Map("id" -> 1, "name" -> 2, "extra" -> 4)), target)

  /** A two-snapshot Iceberg tree over (id long, name string):
    * snap 9001 = file1 (ids 1-3), snap 9002 = file1 + file2 (ids 11-12).
    * Bounds encoded per spec Appendix D by hand.
    */
  private def buildTree(formatVersion: Int, name: String): Path = {
    val loc = new Path(tmpDir(name))
    val f1 = new Path(loc, "data/f1.parquet")
    val f2 = new Path(loc, "data/f2.parquet")
    val b1 = writeParquet(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"), f1)
    val b2 = writeParquet(Seq((11L, "x"), (12L, "y")).toDF("id", "name"), f2)
    import IcebergFixture._
    val fr1 = FileRef(f1.toUri.toString, 3L, b1, Map(
      1 -> (encodeLong(1L), encodeLong(3L), 0L),
      2 -> (encodeString("a"), encodeString("c"), 0L)))
    val fr2 = FileRef(f2.toUri.toString, 2L, b2, Map(
      1 -> (encodeLong(11L), encodeLong(12L), 0L),
      2 -> (encodeString("x"), encodeString("y"), 0L)))
    IcebergFixture.writeTree(conf, loc, formatVersion,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1)),
        SnapRef(9002L, 1700000100000L, Seq(fr1, fr2))))
    loc
  }

  private def engine(name: String): GraftEngine =
    new GraftEngine(spark, tmpDir(name))

  test("v2 tree registers: current read, Iceberg snapshot-id + timestamp travel") {
    val loc = buildTree(2, "ice-v2")
    val e = engine("ice-v2-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 3L, 11L, 12L))
    // time travel by the ICEBERG snapshot id
    assert(e.query(SqlStatement("SELECT id FROM lake.t FOR VERSION AS OF 9001"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // ... and by the Iceberg commit timestamp
    assert(e.catalog.readAsOf("lake", "t", 1700000050000L).count() === 3L)
    // declared schema arrived from the Iceberg schema, carrying the
    // spec's field ids as parquet.field.id metadata (id resolution)
    val decl = e.catalog.declaredSchema("lake", "t").get
    assert(decl.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("id", LongType), ("name", StringType)))
    assert(decl.fields.map(_.metadata.getLong(IcebergInterop.FieldIdKey)).toSeq
      === Seq(1L, 2L))
    // DESCRIBE surfaces the attachment
    val ice = e.query(SqlStatement("DESCRIBE lake.t")).collect()
      .find(_.getString(0) == "# iceberg_source")
    assert(ice.exists(_.getString(1).contains(loc.getName)))
  }

  test("manifest bounds prune: the out-of-range file is never opened") {
    val loc = buildTree(2, "ice-prune")
    val e = engine("ice-prune-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // corrupt file1 (ids 1-3): a filtered read of ids >= 11 must plan
    // only file2 from the DECODED Iceberg bounds and never open file1
    val f1 = new Path(loc, "data/f1.parquet")
    val fs = f1.getFileSystem(conf)
    val out = fs.create(f1, true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    assert(e.query(SqlStatement("SELECT id FROM lake.t WHERE id >= 11"))
      .as[Long].collect().sorted.toSeq === Seq(11L, 12L))
    intercept[Exception] { // file1 IS read without the filter: fails loud
      e.query(SqlStatement("SELECT id FROM lake.t")).collect()
    }
  }

  test("v1 tree registers the same way") {
    val loc = buildTree(1, "ice-v1")
    val e = engine("ice-v1-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't1', '${loc.toUri}')"))
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM lake.t1"))
      .as[Long].head() === 5L)
    assert(e.query(SqlStatement("SELECT name FROM lake.t1 WHERE id = 12"))
      .as[String].head() === "y")
  }

  test("refresh_iceberg_table: one-way sync appends new snapshots, refuses divergence") {
    val loc = buildTree(2, "ice-sync")
    val e = engine("ice-sync-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // nothing new yet: noop
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 0L)
    // the foreign writer commits snapshot 9003 (adds file3) and rolls
    // the metadata forward
    val f3 = new Path(loc, "data/f3.parquet")
    val b3 = writeParquet(Seq((21L, "p"), (22L, "q")).toDF("id", "name"), f3)
    import IcebergFixture._
    val fr1 = FileRef(new Path(loc, "data/f1.parquet").toUri.toString, 3L, 1024L,
      Map(1 -> (encodeLong(1L), encodeLong(3L), 0L)))
    val fr2 = FileRef(new Path(loc, "data/f2.parquet").toUri.toString, 2L, 1024L,
      Map(1 -> (encodeLong(11L), encodeLong(12L), 0L)))
    val fr3 = FileRef(f3.toUri.toString, 2L, b3,
      Map(1 -> (encodeLong(21L), encodeLong(22L), 0L)))
    IcebergFixture.writeTree(spark.sparkContext.hadoopConfiguration, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1)),
        SnapRef(9002L, 1700000100000L, Seq(fr1, fr2)),
        SnapRef(9003L, 1700000200000L, Seq(fr1, fr2, fr3))))
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 1L)
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 3L, 11L, 12L, 21L, 22L))
    // pre-sync history still travels by Iceberg snapshot id
    assert(e.query(SqlStatement("SELECT count(*) AS n FROM lake.t FOR VERSION AS OF 9002"))
      .as[Long].head() === 5L)
    // a LOCAL commit diverges the history: sync must refuse loudly
    e.executeNonQuery(SqlStatement("INSERT INTO lake.t VALUES (99, 'z')"))
    IcebergFixture.writeTree(spark.sparkContext.hadoopConfiguration, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1)),
        SnapRef(9002L, 1700000100000L, Seq(fr1, fr2)),
        SnapRef(9003L, 1700000200000L, Seq(fr1, fr2, fr3)),
        SnapRef(9004L, 1700000300000L, Seq(fr1, fr2, fr3))))
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("CALL system.refresh_iceberg_table('lake', 't')"))
    }
    assert(ex.getMessage.contains("diverged") ||
      Option(ex.getCause).exists(_.getMessage.contains("diverged")))
    // refresh of a non-iceberg table refuses too
    val e2 = e
    e2.executeNonQuery(SqlStatement("CREATE TABLE lake.plain (x bigint)"))
    intercept[GraftQueryException] {
      e2.executeNonQuery(SqlStatement("CALL system.refresh_iceberg_table('lake', 'plain')"))
    }
  }

  test("sync follows foreign schema evolution: new column arrives, old files read NULL") {
    val loc = buildTree(2, "ice-evolve")
    val e = engine("ice-evolve-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // the foreign writer ADDs a column and commits a file carrying it
    val f3 = new Path(loc, "data/f3.parquet")
    val b3 = writeParquet(Seq((21L, "p", 7L), (22L, "q", 8L))
      .toDF("id", "name", "extra"), f3)
    import IcebergFixture._
    val fr1 = FileRef(new Path(loc, "data/f1.parquet").toUri.toString, 3L, 1024L,
      Map(1 -> (encodeLong(1L), encodeLong(3L), 0L)))
    val fr2 = FileRef(new Path(loc, "data/f2.parquet").toUri.toString, 2L, 1024L,
      Map(1 -> (encodeLong(11L), encodeLong(12L), 0L)))
    val fr3 = FileRef(f3.toUri.toString, 2L, b3,
      Map(1 -> (encodeLong(21L), encodeLong(22L), 0L),
        4 -> (encodeLong(7L), encodeLong(8L), 0L)))
    IcebergFixture.writeTree(spark.sparkContext.hadoopConfiguration, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string"), (4, "extra", "long")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1)),
        SnapRef(9002L, 1700000100000L, Seq(fr1, fr2)),
        SnapRef(9003L, 1700000200000L, Seq(fr1, fr2, fr3))))
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 1L)
    val rows = e.query(SqlStatement(
      "SELECT id, extra FROM lake.t ORDER BY id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSeq === Seq((1L, -1L), (2L, -1L), (3L, -1L),
      (11L, -1L), (12L, -1L), (21L, 7L), (22L, 8L)))
  }

  test("v2 positional deletes import onto the merge-on-read read path") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-posdel"))
    val f1 = new Path(loc, "data/f1.parquet")
    val f2 = new Path(loc, "data/f2.parquet")
    val b1 = writeParquet(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"), f1)
    val b2 = writeParquet(Seq((11L, "x"), (12L, "y")).toDF("id", "name"), f2)
    // snapshot 9002 carries a positional-delete file shadowing
    // (f1, pos 1) = id 2 and (f2, pos 0) = id 11 — spec §Position
    // Delete Files: rows addressed by data-file URI + ordinal
    val d1 = new Path(loc, "data/del1.parquet")
    val db1 = writeOneParquet(conf, Seq(
      (f1.toUri.toString, 1L), (f2.toUri.toString, 0L)).toDF("file_path", "pos"), d1)
    val fr1 = FileRef(f1.toUri.toString, 3L, b1,
      Map(1 -> (encodeLong(1L), encodeLong(3L), 0L)))
    val fr2 = FileRef(f2.toUri.toString, 2L, b2,
      Map(1 -> (encodeLong(11L), encodeLong(12L), 0L)))
    val dr1 = FileRef(d1.toUri.toString, 2L, db1, Map.empty)
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1)),
        SnapRef(9002L, 1700000100000L, Seq(fr1, fr2), deletes = Seq(dr1))))
    val e = engine("ice-posdel-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // current state: deleted coordinates are gone
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L, 12L))
    // the delete-free snapshot still time-travels whole
    assert(e.query(SqlStatement("SELECT id FROM lake.t FOR VERSION AS OF 9001"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // a bounds-pruned filtered read merges too
    assert(e.query(SqlStatement("SELECT id FROM lake.t WHERE id >= 11"))
      .as[Long].collect().sorted.toSeq === Seq(12L))
    // refresh: the foreign writer deletes one more row (new delete file
    // carried ALONGSIDE the old one) — sync picks it up
    val d2 = new Path(loc, "data/del2.parquet")
    val db2 = writeOneParquet(conf,
      Seq((f2.toUri.toString, 1L)).toDF("file_path", "pos"), d2)
    val dr2 = FileRef(d2.toUri.toString, 1L, db2, Map.empty)
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1)),
        SnapRef(9002L, 1700000100000L, Seq(fr1, fr2), deletes = Seq(dr1)),
        SnapRef(9003L, 1700000200000L, Seq(fr1, fr2), deletes = Seq(dr1, dr2))))
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 1L)
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L))
    assert(e.query(SqlStatement("SELECT id FROM lake.t FOR VERSION AS OF 9002"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 3L, 12L))
  }

  test("carried positional deletes keep ONE delete dir across append-only foreign commits") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-posdel-carry"))
    val f1 = new Path(loc, "data/f1.parquet")
    val f2 = new Path(loc, "data/f2.parquet")
    val b1 = writeParquet(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"), f1)
    val b2 = writeParquet(Seq((11L, "x"), (12L, "y")).toDF("id", "name"), f2)
    val d1 = new Path(loc, "data/del1.parquet")
    val db1 = writeOneParquet(conf,
      Seq((f1.toUri.toString, 1L)).toDF("file_path", "pos"), d1) // id 2
    val fr1 = FileRef(f1.toUri.toString, 3L, b1, Map.empty)
    val fr2 = FileRef(f2.toUri.toString, 2L, b2, Map.empty)
    val dr1 = FileRef(d1.toUri.toString, 1L, db1, Map.empty)
    def tree(snaps: Int): Unit = IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(
        SnapRef(9001L, 1700000000000L, Seq(fr1), deletes = Seq(dr1)),
        SnapRef(9002L, 1700000100000L, Seq(fr1, fr2), deletes = Seq(dr1)),
        SnapRef(9003L, 1700000200000L, Seq(fr1, fr2), deletes = Seq(dr1))
      ).take(snaps))
    tree(2)
    val e = engine("ice-posdel-carry-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // the append-only foreign commit carried the delete: SAME engine
    // delete dir on both snapshots — cur.deletes == prev.deletes, so
    // append-only classification (streaming reads, incremental MV, CDC)
    // survives the carry instead of seeing a phantom delete
    val cs = e.catalog.snapshots("lake", "t")
    assert(cs.head.deletes.nonEmpty && cs.head.deletes === cs.last.deletes)
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L, 11L, 12L))
    // ...and across a REFRESH boundary too (a fresh convert call must
    // regenerate the same deterministic name, not a new one)
    tree(3)
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 1L)
    val cs2 = e.catalog.snapshots("lake", "t")
    assert(cs2.last.deletes === cs.head.deletes)
  }

  test("a RELOCATED tree's positional deletes follow its files (re-anchored coordinates)") {
    import IcebergFixture._
    // build the tree at locA — metadata.json location and every
    // file_path record locA — then MOVE the whole directory to locB and
    // register from there: data paths AND delete coordinates must both
    // re-anchor, or the delete would silently stop matching
    val locA = new Path(tmpDir("ice-reloc-a"))
    val f1 = new Path(locA, "data/f1.parquet")
    val b1 = writeParquet(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"), f1)
    val d1 = new Path(locA, "data/del1.parquet")
    val db1 = writeOneParquet(conf,
      Seq((f1.toUri.toString, 1L)).toDF("file_path", "pos"), d1) // id 2
    val fr1 = FileRef(f1.toUri.toString, 3L, b1, Map.empty)
    val dr1 = FileRef(d1.toUri.toString, 1L, db1, Map.empty)
    IcebergFixture.writeTree(conf, locA, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1), deletes = Seq(dr1))))
    val locB = new Path(tmpDir("ice-reloc-b"), "moved")
    val fs2 = locA.getFileSystem(conf)
    fs2.mkdirs(locB.getParent)
    require(fs2.rename(locA, locB), "relocation rename failed")
    val e = engine("ice-reloc-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${locB.toUri}')"))
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L))
  }

  /** A three-snapshot v2 tree with EQUALITY deletes over (id, name):
    * snap 9001 (seq 1) = f1 {1,2,3};
    * snap 9002 (seq 2) = f1+f2 {11,12}, eq-delete e1 keyed on id {2,11}
    *   at seq 2 — shadows f1 (seq 1) only, so id 11 in the SAME-commit
    *   f2 is exempt (Iceberg's strictly-smaller rule);
    * snap 9003 (seq 3) = +f3 {21}, e1 carried (explicit seq 2) plus
    *   e2 keyed on id {12} at seq 3 — shadows f1 AND f2.
    */
  private def buildEqDeleteTree(name: String): Path = {
    import IcebergFixture._
    val loc = new Path(tmpDir(name))
    val f1 = new Path(loc, "data/f1.parquet")
    val f2 = new Path(loc, "data/f2.parquet")
    val f3 = new Path(loc, "data/f3.parquet")
    val b1 = writeParquet(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"), f1)
    val b2 = writeParquet(Seq((11L, "x"), (12L, "y")).toDF("id", "name"), f2)
    val b3 = writeParquet(Seq((21L, "z")).toDF("id", "name"), f3)
    val e1 = new Path(loc, "data/eqdel1.parquet")
    val eb1 = writeParquet(Seq(2L, 11L).toDF("id"), e1)
    val e2 = new Path(loc, "data/eqdel2.parquet")
    val eb2 = writeParquet(Seq(12L).toDF("id"), e2)
    val fr1 = FileRef(f1.toUri.toString, 3L, b1, Map(
      1 -> (encodeLong(1L), encodeLong(3L), 0L)))
    val fr2 = FileRef(f2.toUri.toString, 2L, b2, Map(
      1 -> (encodeLong(11L), encodeLong(12L), 0L)))
    val fr3 = FileRef(f3.toUri.toString, 1L, b3, Map(
      1 -> (encodeLong(21L), encodeLong(21L), 0L)))
    val er1 = FileRef(e1.toUri.toString, 2L, eb1, Map.empty, eqIds = Seq(1))
    val er2 = FileRef(e2.toUri.toString, 1L, eb2, Map.empty, eqIds = Seq(1))
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(
        SnapRef(9001L, 1700000000000L, Seq(fr1)),
        SnapRef(9002L, 1700000100000L,
          // the carried f1 is an EXISTING entry with its original seq
          Seq(fr1.copy(status = 0, dataSeq = Some(1L)), fr2),
          eqDeletes = Seq(er1)),
        SnapRef(9003L, 1700000200000L,
          Seq(fr1.copy(status = 0, dataSeq = Some(1L)),
            fr2.copy(status = 0, dataSeq = Some(2L)), fr3),
          eqDeletes = Seq(er1.copy(status = 0, dataSeq = Some(2L)), er2))))
    loc
  }

  test("v2 equality deletes import: sequence scoping, same-commit exemption, travel") {
    val loc = buildEqDeleteTree("ice-eqdel")
    val e = engine("ice-eqdel-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // current (9003): e1 removes id 2 (f1, seq 1 < 2); 11 exempt (f2 at
    // seq 2 is NOT < 2); e2 removes id 12 (f2, seq 2 < 3)
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L, 11L, 21L))
    // 9002: only e1 pending — id 2 gone, 11 and 12 both present
    assert(e.query(SqlStatement("SELECT id FROM lake.t FOR VERSION AS OF 9002"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 3L, 11L, 12L))
    // 9001: no deletes yet
    assert(e.query(SqlStatement("SELECT id FROM lake.t FOR VERSION AS OF 9001"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // a filtered, bounds-pruned read still merges the deletes
    assert(e.query(SqlStatement("SELECT id FROM lake.t WHERE id <= 3"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    // $files surfaces the imported equality-delete file as content 2
    val contents = e.query(SqlStatement(
      "SELECT content FROM lake.\"t$files\"")).as[Int].collect().toSeq
    assert(contents.count(_ == 2) === 2 && contents.count(_ == 0) === 3)
    // CDC over the attached table: imported equality deletes surface as
    // row-level retractions attributed to their commit, appends as
    // inserts — the changelog a downstream pipeline tails
    val ch = e.catalog.readChanges("lake", "t", 9001L, 9003L)
      .select("id", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, Long)].collect().toSet
    assert(ch === Set(
      (11L, "insert", 9002L), (12L, "insert", 9002L), (2L, "delete", 9002L),
      (21L, "insert", 9003L), (12L, "delete", 9003L)))
  }

  test("equality deletes: refresh reuses carried delete dirs; new deletes arrive") {
    import IcebergFixture._
    val loc = buildEqDeleteTree("ice-eqdel-sync")
    val e = engine("ice-eqdel-sync-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    val before = e.catalog.snapshots("lake", "t")
    // the foreign writer upserts again: snap 9004 (seq 4) deletes id 21
    val f1 = new Path(loc, "data/f1.parquet")
    val f2 = new Path(loc, "data/f2.parquet")
    val f3 = new Path(loc, "data/f3.parquet")
    val e1 = new Path(loc, "data/eqdel1.parquet")
    val e2 = new Path(loc, "data/eqdel2.parquet")
    val e3 = new Path(loc, "data/eqdel3.parquet")
    val eb3 = writeParquet(Seq(21L).toDF("id"), e3)
    val fr1 = FileRef(f1.toUri.toString, 3L, 1L, Map.empty, status = 0, dataSeq = Some(1L))
    val fr2 = FileRef(f2.toUri.toString, 2L, 1L, Map.empty, status = 0, dataSeq = Some(2L))
    val fr3 = FileRef(f3.toUri.toString, 1L, 1L, Map.empty, status = 0, dataSeq = Some(3L))
    val er1 = FileRef(e1.toUri.toString, 2L, 1L, Map.empty, eqIds = Seq(1),
      status = 0, dataSeq = Some(2L))
    val er2 = FileRef(e2.toUri.toString, 1L, 1L, Map.empty, eqIds = Seq(1),
      status = 0, dataSeq = Some(3L))
    val er3 = FileRef(e3.toUri.toString, 1L, eb3, Map.empty, eqIds = Seq(1))
    // rebuild the tree with the original three snapshots plus 9004
    val lfs = loc.getFileSystem(conf)
    def sized(fr: FileRef, p: Path) = fr.copy(bytes = lfs.getFileStatus(p).getLen)
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(
        SnapRef(9001L, 1700000000000L, Seq(sized(fr1, f1).copy(status = 1, dataSeq = None))),
        SnapRef(9002L, 1700000100000L, Seq(sized(fr1, f1), sized(fr2, f2).copy(status = 1, dataSeq = None)),
          eqDeletes = Seq(sized(er1, e1).copy(status = 1, dataSeq = None))),
        SnapRef(9003L, 1700000200000L, Seq(sized(fr1, f1), sized(fr2, f2), sized(fr3, f3).copy(status = 1, dataSeq = None)),
          eqDeletes = Seq(sized(er1, e1), sized(er2, e2).copy(status = 1, dataSeq = None))),
        SnapRef(9004L, 1700000300000L, Seq(sized(fr1, f1), sized(fr2, f2), sized(fr3, f3)),
          eqDeletes = Seq(sized(er1, e1), sized(er2, e2), er3))))
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 1L)
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L, 11L))
    // carried deletes map to the SAME EqDelete values across the sync —
    // no phantom delete dirs, no CDC ghosts between refreshes
    val after = e.catalog.snapshots("lake", "t")
    assert(after.take(3).map(_.eqDeletes) === before.map(_.eqDeletes))
    assert(after.last.eqDeletes.toSet.size === 3)
    assert(before.last.eqDeletes.toSet.subsetOf(after.last.eqDeletes.toSet))
  }

  test("foreign TAGS mirror onto graft tags: create, follow a re-point, drop") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-tags"))
    val f1 = new Path(loc, "data/f1.parquet")
    val f2 = new Path(loc, "data/f2.parquet")
    val b1 = writeParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), f1)
    val b2 = writeParquet(Seq((11L, "x")).toDF("id", "name"), f2)
    val fr1 = FileRef(f1.toUri.toString, 2L, b1, Map.empty)
    val fr2 = FileRef(f2.toUri.toString, 1L, b2, Map.empty)
    val fields = Seq((1, "id", "long"), (2, "name", "string"))
    def tree(tags: Map[String, Long], snaps: Int = 2): Unit =
      IcebergFixture.writeTree(conf, loc, 2, fields,
        Seq(SnapRef(9001L, 1700000000000L, Seq(fr1)),
          SnapRef(9002L, 1700000100000L, Seq(fr1, fr2)),
          SnapRef(9003L, 1700000200000L, Seq(fr1, fr2))).take(snaps),
        tagRefs = tags)
    tree(Map("v1" -> 9001L))
    val e = engine("ice-tags-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // the foreign tag reads through the graft ref surface
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM lake.t FOR VERSION AS OF 'v1'"))
      .as[Long].head() === 2L)
    // a LOCAL tag the sync must never touch
    e.catalog.createTag("lake", "t", "mine", Some(9001L))
    // tags-only foreign change: v1 re-points, v2 arrives — synced=0
    // snapshots but the tag set mirrors
    tree(Map("v1" -> 9002L, "v2" -> 9001L))
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 0L)
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM lake.t FOR VERSION AS OF 'v1'"))
      .as[Long].head() === 3L)
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM lake.t FOR VERSION AS OF 'v2'"))
      .as[Long].head() === 2L)
    // the source drops v2 and commits a snapshot; the mirror follows,
    // the local tag survives
    tree(Map("v1" -> 9002L), snaps = 3)
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 1L)
    assert(e.catalog.listTags("lake", "t").keySet === Set("v1", "mine"))
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM lake.t FOR VERSION AS OF 'mine'"))
      .as[Long].head() === 2L)
    // a source tag that COINCIDES with the local one (same name, same
    // snapshot) must not adopt it: when the source later drops the
    // name, the user's tag survives
    tree(Map("v1" -> 9002L, "mine" -> 9001L), snaps = 3)
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 0L)
    tree(Map("v1" -> 9002L), snaps = 3)
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 0L)
    assert(e.catalog.listTags("lake", "t").keySet === Set("v1", "mine"))
  }

  test("foreign BRANCHES mirror onto graft branch logs: off-main ancestry, advance, drop") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-branch"))
    val f1 = new Path(loc, "data/f1.parquet")
    val f2 = new Path(loc, "data/f2.parquet")
    val fb = new Path(loc, "data/fb.parquet")
    val fb2 = new Path(loc, "data/fb2.parquet")
    val b1 = writeParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), f1)
    val b2 = writeParquet(Seq((11L, "x")).toDF("id", "name"), f2)
    val bb = writeParquet(Seq((100L, "dev")).toDF("id", "name"), fb)
    val bb2 = writeParquet(Seq((101L, "dev2")).toDF("id", "name"), fb2)
    val fr1 = FileRef(f1.toUri.toString, 2L, b1, Map.empty)
    val fr2 = FileRef(f2.toUri.toString, 1L, b2, Map.empty)
    val frb = FileRef(fb.toUri.toString, 1L, bb, Map.empty)
    val frb2 = FileRef(fb2.toUri.toString, 1L, bb2, Map.empty)
    val fields = Seq((1, "id", "long"), (2, "name", "string"))
    val mdir = new Path(loc, "metadata")
    // hand-build: main = 9001 → 9002; branch 'dev' forks at 9001 with
    // off-main snapshots 8101 (f1+fb) and later 8102 (f1+fb+fb2)
    def writeMeta(devHead: Option[Long], withDev2: Boolean): Unit = {
      def man(id: Long, refs: Seq[FileRef], seq: Long) = {
        val (p, len) = IcebergFixture.writeManifest(conf, mdir, id, refs)
        IcebergFixture.writeManifestListSeq(conf, mdir, id, Seq((p, len, 0, seq)))
      }
      val ml9001 = man(9001L, Seq(fr1), 1L)
      val ml9002 = man(9002L, Seq(fr1, fr2), 2L)
      val ml8101 = man(8101L, Seq(fr1, frb), 3L)
      val ml8102 = man(8102L, Seq(fr1, frb, frb2), 4L)
      val snaps =
        Seq((SnapRef(9001L, 1700000000000L, Nil, seq = Some(1L)), ml9001),
          (SnapRef(9002L, 1700000100000L, Nil, seq = Some(2L)), ml9002),
          (SnapRef(8101L, 1700000200000L, Nil, seq = Some(3L)), ml8101)) ++
        (if (withDev2)
          Seq((SnapRef(8102L, 1700000300000L, Nil, seq = Some(4L)), ml8102))
        else Nil)
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val json = IcebergFixture.metadataJson(2, loc.toUri.toString, fields,
        snaps, 9002L,
        branchRefs = devHead.map("dev" -> _).toMap)
      // stitch parent ids: 9002←9001, 8101←9001, 8102←8101 (the fixture
      // chains linearly, the branch shape needs explicit parents)
      val root = m.readTree(json).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      root.get("snapshots").elements().forEachRemaining { n =>
        val o = n.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        o.get("snapshot-id").asLong match {
          case 9002L | 8101L => o.put("parent-snapshot-id", 9001L)
          case 8102L => o.put("parent-snapshot-id", 8101L)
          case _ => o.remove("parent-snapshot-id")
        }
      }
      val fs2 = mdir.getFileSystem(conf)
      val out = fs2.create(new Path(mdir, "v1.metadata.json"), true)
      out.write(m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
        .getBytes("UTF-8")); out.close()
      val hint = fs2.create(new Path(mdir, "version-hint.text"), true)
      hint.write("1".getBytes("UTF-8")); hint.close()
    }
    writeMeta(devHead = Some(8101L), withDev2 = false)
    val wh = tmpDir("ice-branch-wh")
    val e = new GraftEngine(spark, wh)
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // main excludes the branch snapshot; the branch sees fork + its own
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 11L))
    assert(e.query(SqlStatement(
      "SELECT id FROM lake.t FOR VERSION AS OF 'dev'")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 100L))
    // branch-scoped travel to the fork point
    assert(e.query(SqlStatement(
      "SELECT count(*) AS n FROM lake.t FOR VERSION AS OF 9001")).as[Long]
      .head() === 2L)
    // the branch ADVANCES without main moving: refs-only sync mirrors it
    writeMeta(devHead = Some(8102L), withDev2 = true)
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 0L)
    assert(e.query(SqlStatement(
      "SELECT id FROM lake.t FOR VERSION AS OF 'dev'")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 100L, 101L))
    // the branch-minted manifest reuse PERSISTS after the sync (round-12
    // advice: pruning to the main tip alone dropped it, making every
    // branch advance re-decode the whole carried branch): the recorded
    // map keeps the branch head's manifest alongside the main tip's
    val srcJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(wh, "lake/t/_iceberg_source")), "UTF-8")
    assert(srcJson.contains("m0-8102"), "branch-head manifest reuse lost")
    assert(srcJson.contains("m0-9002"), "main-tip manifest reuse lost")
    // local commits on the mirrored branch refuse the next sync
    e.catalog.branch("dev").insert("lake", "t",
      Seq((999L, "local")).toDF("id", "name"))
    writeMeta(devHead = None, withDev2 = true)
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        "CALL system.refresh_iceberg_table('lake', 't')"))
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("local commits"))
  }

  test("first-mirror crash windows converge: intent write-ahead, no permanent collision") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-crash"))
    val f1 = new Path(loc, "data/f1.parquet")
    val fb = new Path(loc, "data/fb.parquet")
    val b1 = writeParquet(Seq((1L, "a")).toDF("id", "name"), f1)
    val bb = writeParquet(Seq((100L, "dev")).toDF("id", "name"), fb)
    val fr1 = FileRef(f1.toUri.toString, 1L, b1, Map.empty)
    val frb = FileRef(fb.toUri.toString, 1L, bb, Map.empty)
    val fields = Seq((1, "id", "long"), (2, "name", "string"))
    // v1 of the tree: one main snapshot, NO refs — mirrors arrive later
    def writeMeta(withRefs: Boolean): Unit = {
      val mdir = new Path(loc, "metadata")
      def man(id: Long, refs: Seq[FileRef], seq: Long) = {
        val (p, len) = IcebergFixture.writeManifest(conf, mdir, id, refs)
        IcebergFixture.writeManifestListSeq(conf, mdir, id, Seq((p, len, 0, seq)))
      }
      val ml1 = man(9001L, Seq(fr1), 1L)
      val ml2 = man(8101L, Seq(fr1, frb), 2L)
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val json = IcebergFixture.metadataJson(2, loc.toUri.toString, fields,
        Seq((SnapRef(9001L, 1700000000000L, Nil, seq = Some(1L)), ml1),
          (SnapRef(8101L, 1700000100000L, Nil, seq = Some(2L),
            parentId = Some(9001L)), ml2)),
        9001L,
        tagRefs = if (withRefs) Map("pin" -> 9001L) else Map.empty,
        branchRefs = if (withRefs) Map("dev" -> 8101L) else Map.empty)
      val root = m.readTree(json)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      // 8101 is branch ancestry, not main — give it its explicit parent
      val fs2 = mdir.getFileSystem(conf)
      val out = fs2.create(new Path(mdir, "v1.metadata.json"), true)
      out.write(m.writeValueAsString(root).getBytes("UTF-8")); out.close()
      val hint = fs2.create(new Path(mdir, "version-hint.text"), true)
      hint.write("1".getBytes("UTF-8")); hint.close()
    }
    writeMeta(withRefs = false)
    val e = engine("ice-crash-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // the source grows a tag + a branch; the FIRST mirror of each
    // crashes at every window — the next (clean) sync must converge to
    // the mirror, never refuse the debris as a local-ref collision
    writeMeta(withRefs = true)
    final class InjectedCrash(p: String) extends RuntimeException(p)
    Seq("icesync.tag-intent", "icesync.tag-created",
        "icesync.branch-intent", "icesync.branch-written").foreach { point =>
      SnapshotCatalog.faultHook =
        id => if (id == point) throw new InjectedCrash(point)
      try intercept[Throwable] {
        e.executeNonQuery(SqlStatement(
          "CALL system.refresh_iceberg_table('lake', 't')"))
      } finally SnapshotCatalog.faultHook = _ => ()
      // clean retry converges (a new engine = a new process)
      val e2 = new GraftEngine(spark, e.catalog.warehouse)
      e2.executeNonQuery(SqlStatement(
        "CALL system.refresh_iceberg_table('lake', 't')"))
      assert(e2.catalog.listTags("lake", "t").get("pin")
        .map(_.snapshotId) === Some(9001L), s"tag did not converge after $point")
      assert(e2.query(SqlStatement(
        "SELECT id FROM lake.t FOR VERSION AS OF 'dev'")).as[Long]
        .collect().sorted.toSeq === Seq(1L, 100L),
        s"branch did not converge after $point")
      // reset for the next window: source drops the refs, sync follows
      writeMeta(withRefs = false)
      e2.executeNonQuery(SqlStatement(
        "CALL system.refresh_iceberg_table('lake', 't')"))
      assert(e2.catalog.listTags("lake", "t").isEmpty,
        s"mirror debris after $point is stuck local (drop refused)")
      assert(!e2.catalog.listBranches("lake", "t").contains("dev"),
        s"branch debris after $point is stuck local")
      writeMeta(withRefs = true)
    }
  }

  test("foreign snapshot EXPIRY keeps carried equality deletes scoped (recorded seqs)") {
    import IcebergFixture._
    val loc = buildEqDeleteTree("ice-eqdel-expire")
    val e = engine("ice-eqdel-expire-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // the foreign writer EXPIRES snapshots 9001+9002 (their boundary
    // file sets vanish from the source metadata) and commits 9004
    // (seq 4) carrying e1 (seq 2) + e2 (seq 3) plus a NEW delete e3
    // (keyed {21}, seq 4). The import must still scope e1/e2 to the
    // expired boundaries — recorded at registration, file sets retained
    // in the graft manifests
    val f = Seq("f1", "f2", "f3").map(n => new Path(loc, s"data/$n.parquet"))
    val eqs = Seq("eqdel1", "eqdel2").map(n => new Path(loc, s"data/$n.parquet"))
    val e3 = new Path(loc, "data/eqdel3.parquet")
    val eb3 = writeParquet(Seq(21L).toDF("id"), e3)
    val lfs = loc.getFileSystem(conf)
    def ref(p: Path, rows: Long, seq: Long, eqIds: Seq[Int] = Nil) =
      FileRef(p.toUri.toString, rows, lfs.getFileStatus(p).getLen, Map.empty,
        eqIds = eqIds, dataSeq = Some(seq), status = 0)
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(
        SnapRef(9003L, 1700000200000L,
          Seq(ref(f(0), 3L, 1L), ref(f(1), 2L, 2L), ref(f(2), 1L, 3L)),
          eqDeletes = Seq(ref(eqs(0), 2L, 2L, eqIds = Seq(1)),
            ref(eqs(1), 1L, 3L, eqIds = Seq(1))),
          seq = Some(3L)),
        SnapRef(9004L, 1700000300000L,
          Seq(ref(f(0), 3L, 1L), ref(f(1), 2L, 2L), ref(f(2), 1L, 3L)),
          eqDeletes = Seq(ref(eqs(0), 2L, 2L, eqIds = Seq(1)),
            ref(eqs(1), 1L, 3L, eqIds = Seq(1)),
            FileRef(e3.toUri.toString, 1L, eb3, Map.empty, eqIds = Seq(1))),
          seq = Some(4L))))
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 1L)
    // e1 still kills 2 (f1 @ seq 1 < 2), e2 kills 12 (f2 @ 2 < 3), e3
    // kills 21 (f3 @ 3 < 4); 11 stays exempt forever (same-commit rule)
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L, 11L))
    // pre-expiry history still travels
    assert(e.query(SqlStatement("SELECT id FROM lake.t FOR VERSION AS OF 9002"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 3L, 11L, 12L))
  }

  test("equality deletes whose sequence scope matches no snapshot boundary refuse") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-eqdel-bad"))
    val f1 = new Path(loc, "data/f1.parquet")
    val f3 = new Path(loc, "data/f3.parquet")
    val b1 = writeParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), f1)
    val b3 = writeParquet(Seq((21L, "z")).toDF("id", "name"), f3)
    val e1 = new Path(loc, "data/eqdel1.parquet")
    val eb1 = writeParquet(Seq(2L).toDF("id"), e1)
    val fr1 = FileRef(f1.toUri.toString, 2L, b1, Map.empty)
    // f3 committed at snap 9002 (seq 2) but CARRYING data seq 1 — the
    // rewrite-under-pending-delete shape: the delete at seq 2 shadows
    // it by sequence, but no snapshot boundary contains {f1, f3} ∩ live
    val fr3 = FileRef(f3.toUri.toString, 1L, b3, Map.empty, dataSeq = Some(1L))
    val er1 = FileRef(e1.toUri.toString, 1L, eb1, Map.empty, eqIds = Seq(1))
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(
        SnapRef(9001L, 1700000000000L, Seq(fr1)),
        SnapRef(9002L, 1700000100000L,
          Seq(fr1.copy(status = 0, dataSeq = Some(1L)), fr3),
          eqDeletes = Seq(er1))))
    val e = engine("ice-eqdel-bad-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        s"CALL system.register_iceberg_table('lake', 'td', '${loc.toUri}')"))
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("does not match any snapshot boundary"))
    assert(!e.catalog.tableExists("lake", "td"))
  }

  test("foreign RENAME COLUMN: pre-rename files read VALUES by field id, not NULLs") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-rename"))
    val f1 = new Path(loc, "data/f1.parquet")
    // the file carries the OLD column name `name` under field id 2
    val b1 = writeParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), f1)
    val fr1 = FileRef(f1.toUri.toString, 2L, b1,
      Map(1 -> (encodeLong(1L), encodeLong(2L), 0L)))
    // ... and the CURRENT schema renamed field 2 to `label` (what the
    // tree looks like after Trino's ALTER TABLE … RENAME COLUMN)
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "label", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1))))
    val e = engine("ice-rename-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    val rows = e.query(SqlStatement("SELECT id, label FROM lake.t ORDER BY id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // the old-name file's values come back under the new name — id
    // resolution; a name-based read would return (1,null),(2,null)
    assert(rows === Seq((1L, "a"), (2L, "b")))
    // the symmetric hazard: a NEW column reusing a dropped column's
    // NAME must not resurrect the dropped values — `name` returns as
    // field id 3, which no file carries → NULLs
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "label", "string"), (3, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1)),
        SnapRef(9002L, 1700000100000L, Seq(fr1))))
    assert(e.executeNonQuery(SqlStatement(
      "CALL system.refresh_iceberg_table('lake', 't')")) === 1L)
    val withNew = e.query(SqlStatement("SELECT id, name FROM lake.t ORDER BY id"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSeq
    assert(withNew === Seq((1L, true), (2L, true)))
  }

  test("id-less data files fall back to name reads; a footer-name mismatch refuses") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-noid"))
    val f1 = new Path(loc, "data/f1.parquet")
    // NO field ids in the file (the migrate/add_files shape)
    val b1 = writeOneParquet(conf,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), f1)
    val fr1 = FileRef(f1.toUri.toString, 2L, b1, Map.empty)
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1))))
    val e = engine("ice-noid-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // name fallback: reads work, and the declared schema carries NO ids
    assert(e.query(SqlStatement("SELECT name FROM lake.t WHERE id = 2"))
      .as[String].head() === "b")
    assert(e.catalog.declaredSchema("lake", "t").get.fields
      .forall(!_.metadata.contains(IcebergInterop.FieldIdKey)))
    // a renamed tree with id-less files CANNOT be read faithfully by
    // either rule — the footer-name mismatch must refuse at register
    val loc2 = new Path(tmpDir("ice-noid-ren"))
    val g1 = new Path(loc2, "data/f1.parquet")
    val gb1 = writeOneParquet(conf,
      Seq((1L, "a")).toDF("id", "name"), g1)
    val gr1 = FileRef(g1.toUri.toString, 1L, gb1, Map.empty)
    IcebergFixture.writeTree(conf, loc2, 2,
      Seq((1, "id", "long"), (2, "label", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(gr1))))
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        s"CALL system.register_iceberg_table('lake', 'bad', '${loc2.toUri}')"))
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("no parquet field ids"))
    assert(!e.catalog.tableExists("lake", "bad"))
  }

  test("foreign identity partition spec: $partitions rollup, pruning, metadata DELETE") {
    import IcebergFixture._
    val loc = new Path(tmpDir("ice-part"))
    val f1 = new Path(loc, "data/region=eu/f1.parquet")
    val f2 = new Path(loc, "data/region=us/f2.parquet")
    // Iceberg data files physically CARRY the partition column — only
    // the manifests' partition struct is authoritative for pruning
    val b1 = writeParquet(Seq((1L, "eu"), (2L, "eu")).toDF("id", "name"), f1)
    val b2 = writeParquet(Seq((11L, "us"), (12L, "us"), (13L, "us"))
      .toDF("id", "name"), f2)
    val fr1 = FileRef(f1.toUri.toString, 2L, b1,
      Map(1 -> (encodeLong(1L), encodeLong(2L), 0L)),
      partition = Seq("region" -> "eu"))
    val fr2 = FileRef(f2.toUri.toString, 3L, b2,
      Map(1 -> (encodeLong(11L), encodeLong(13L), 0L)),
      partition = Seq("region" -> "us"))
    writeTreeWithCurrent(conf, loc,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1, fr2))),
      currentId = 9001L, formatVersion = 2,
      specFields = Seq(("region", "identity", 2)),
      partAvroTypes = Seq(("region", "string")))
    val e = engine("ice-part-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // the $partitions rollup reconstructs the foreign identity
    // partitions from the imported exact bounds
    val parts = e.query(SqlStatement(
      """SELECT partition, file_count, record_count FROM lake."t$partitions" ORDER BY partition"""))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(parts === Seq(("region=eu", 1L, 2L), ("region=us", 1L, 3L)))
    // partition pruning from the imported partition VALUES: corrupt the
    // us file — an eu-filtered read must never open it
    val fs2 = f2.getFileSystem(conf)
    val out = fs2.create(f2, true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    assert(e.query(SqlStatement("SELECT id FROM lake.t WHERE name = 'eu'"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // partition-aligned metadata DELETE: the us file is UNREADABLE, so
    // only a bounds-proven whole-file drop (zero reads) can succeed
    assert(e.executeNonQuery(SqlStatement(
      "DELETE FROM lake.t WHERE name = 'us'")) === 3L)
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("an ORC-declared data file refuses at register, not mid-read") {
    val loc = new Path(tmpDir("ice-orc"))
    val f1 = new Path(loc, "data/f1.parquet")
    val b1 = writeParquet(Seq((1L, "a")).toDF("id", "name"), f1)
    import IcebergFixture._
    // the manifest DECLARES the file ORC (one config flip on a real
    // Iceberg writer): the attach must refuse with a typed message at
    // the boundary, never stack-trace on parquet magic at read time
    val fr1 = FileRef(f1.toUri.toString, 1L, b1, Map.empty, format = "ORC")
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1))))
    val e = engine("ice-orc-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("ORC") && msg.contains("PARQUET"))
    assert(!e.catalog.tableExists("lake", "t"))
  }

  test("uuid and fixed columns attach: canonical render, uuid bounds prune") {
    val loc = new Path(tmpDir("ice-uuid"))
    import IcebergFixture._
    def uuidBytes(s: String): Array[Byte] = {
      val u = java.util.UUID.fromString(s)
      java.nio.ByteBuffer.allocate(16)
        .putLong(u.getMostSignificantBits)
        .putLong(u.getLeastSignificantBits).array()
    }
    val u1 = "10000000-0000-0000-0000-000000000001"
    val u2 = "3fffffff-0000-0000-0000-000000000002"
    val u3 = "c0000000-0000-0000-0000-000000000003"
    // data files store the uuid as its canonical varchar render (the
    // reference's own GUID storage, 02-tables.sql:49) and fixed[4] as
    // binary; the METADATA declares uuid/fixed
    val f1 = new Path(loc, "data/f1.parquet")
    val f2 = new Path(loc, "data/f2.parquet")
    def wp(df: org.apache.spark.sql.DataFrame, t: Path): Long =
      IcebergFixture.writeOneParquet(conf, IcebergFixture.withFieldIds(df,
        Map("id" -> 1, "guid" -> 2, "blob" -> 3)), t)
    val b1 = wp(Seq((1L, u1, Array[Byte](1, 2, 3, 4)),
      (2L, u2, Array[Byte](5, 6, 7, 8))).toDF("id", "guid", "blob"), f1)
    val b2 = wp(Seq((3L, u3, Array[Byte](9, 10, 11, 12)))
      .toDF("id", "guid", "blob"), f2)
    val fr1 = FileRef(f1.toUri.toString, 2L, b1, Map(
      1 -> (encodeLong(1L), encodeLong(2L), 0L),
      2 -> (uuidBytes(u1), uuidBytes(u2), 0L)))
    val fr2 = FileRef(f2.toUri.toString, 1L, b2, Map(
      1 -> (encodeLong(3L), encodeLong(3L), 0L),
      2 -> (uuidBytes(u3), uuidBytes(u3), 0L)))
    IcebergFixture.writeTree(conf, loc, 2,
      Seq((1, "id", "long"), (2, "guid", "uuid"), (3, "blob", "fixed[4]")),
      Seq(SnapRef(9001L, 1700000000000L, Seq(fr1, fr2))))
    val e = engine("ice-uuid-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // values read as canonical strings / raw bytes
    assert(e.query(SqlStatement("SELECT guid FROM lake.t WHERE id = 1"))
      .as[String].collect().toSeq === Seq(u1))
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // uuid bounds decoded from 16-byte big-endian prune: corrupt f2 —
    // a guid-ranged read inside f1's bounds must never open f2
    val out = f2.getFileSystem(conf).create(f2, true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    assert(e.query(SqlStatement(
      s"SELECT id FROM lake.t WHERE guid = '$u2'"))
      .as[Long].collect().toSeq === Seq(2L))
  }

  test("single-value bound decoding: every supported type round-trips") {
    import IcebergFixture._
    def dec(dt: DataType, b: Array[Byte]) =
      IcebergInterop.decodeBound(dt, Some(b))
    assert(dec(LongType, encodeLong(-42L)) === Some(("long", "-42")))
    assert(dec(IntegerType, encodeInt(7)) === Some(("long", "7")))
    assert(dec(DateType, encodeInt(19000)) === Some(("date", "19000")))
    assert(dec(TimestampType, encodeLong(1700000000000000L)) ===
      Some(("ts", "1700000000000000")))
    assert(dec(TimestampNTZType, encodeLong(5L)) === Some(("ts", "5")))
    assert(dec(DoubleType, encodeDouble(2.5)) === Some(("double", "2.5")))
    assert(dec(StringType, encodeString("héllo")) === Some(("string", "héllo")))
    // NaN and wrong widths drop the bound (conservative)
    assert(dec(DoubleType, encodeDouble(Double.NaN)) === None)
    assert(dec(LongType, encodeInt(1)) === None)
    assert(IcebergInterop.decodeBound(BinaryType, Some(Array[Byte](1))) === None)
  }

  test("main-line ancestry: staged (WAP) snapshots past the current head do not import") {
    val loc = new Path(tmpDir("ice-wap"))
    val f1 = new Path(loc, "data/f1.parquet")
    val f2 = new Path(loc, "data/f2.parquet")
    val b1 = writeParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), f1)
    val b2 = writeParquet(Seq((11L, "x")).toDF("id", "name"), f2)
    import IcebergFixture._
    val fr1 = FileRef(f1.toUri.toString, 2L, b1, Map.empty)
    val fr2 = FileRef(f2.toUri.toString, 1L, b2, Map.empty)
    // the metadata's snapshot list holds a STAGED child (9002) of the
    // current snapshot (9001): current-snapshot-id stays 9001 — the
    // fixture writes parent ids in list order, so reuse writeTree's
    // manifest machinery but hand-build the metadata JSON
    val conf2 = spark.sparkContext.hadoopConfiguration
    val mdir = new Path(loc, "metadata")
    val ml1 = IcebergFixture.writeManifestList(conf2, mdir, 9001L,
      Seq(IcebergFixture.writeManifest(conf2, mdir, 9001L, Seq(fr1))))
    val ml2 = IcebergFixture.writeManifestList(conf2, mdir, 9002L,
      Seq(IcebergFixture.writeManifest(conf2, mdir, 9002L, Seq(fr1, fr2))))
    val json = IcebergFixture.metadataJson(2, loc.toUri.toString,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq((SnapRef(9001L, 1700000000000L, Seq(fr1)), ml1),
        (SnapRef(9002L, 1700000100000L, Seq(fr1, fr2)), ml2)),
      currentSnapshotId = 9001L)
    val fs = mdir.getFileSystem(conf2)
    val out = fs.create(new Path(mdir, "v1.metadata.json"), true)
    out.write(json.getBytes("UTF-8")); out.close()
    val hint = fs.create(new Path(mdir, "version-hint.text"), true)
    hint.write("1".getBytes("UTF-8")); hint.close()
    val e = engine("ice-wap-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    // only the CURRENT state imported — the staged snapshot's rows absent
    assert(e.query(SqlStatement("SELECT id FROM lake.t")).as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L))
    assert(e.catalog.snapshots("lake", "t").map(_.snapshotId) === Seq(9001L))
  }

  test("foreign rollback refuses the sync; a failed sync leaves the schema untouched") {
    val loc = buildTree(2, "ice-rb")
    val e = engine("ice-rb-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    e.executeNonQuery(SqlStatement(
      s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')"))
    import IcebergFixture._
    val fr1 = FileRef(new Path(loc, "data/f1.parquet").toUri.toString, 3L, 1024L,
      Map(1 -> (encodeLong(1L), encodeLong(3L), 0L)))
    val fr2 = FileRef(new Path(loc, "data/f2.parquet").toUri.toString, 2L, 1024L,
      Map(1 -> (encodeLong(11L), encodeLong(12L), 0L)))
    val conf2 = spark.sparkContext.hadoopConfiguration
    // the foreign table ROLLS BACK to 9001 (both snapshots still listed,
    // current points at the older one): syncing a history rewrite must
    // refuse with a clear message
    val mdir = new Path(loc, "metadata")
    val ml1 = IcebergFixture.writeManifestList(conf2, mdir, 9001L,
      Seq(IcebergFixture.writeManifest(conf2, mdir, 9001L, Seq(fr1))))
    val ml2 = IcebergFixture.writeManifestList(conf2, mdir, 9002L,
      Seq(IcebergFixture.writeManifest(conf2, mdir, 9002L, Seq(fr1, fr2))))
    val json = IcebergFixture.metadataJson(2, loc.toUri.toString,
      Seq((1, "id", "long"), (2, "name", "string")),
      Seq((SnapRef(9001L, 1700000000000L, Seq(fr1)), ml1),
        (SnapRef(9002L, 1700000100000L, Seq(fr1, fr2)), ml2)),
      currentSnapshotId = 9001L)
    val fs = mdir.getFileSystem(conf2)
    val out = fs.create(new Path(mdir, "v1.metadata.json"), true)
    out.write(json.getBytes("UTF-8")); out.close()
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("CALL system.refresh_iceberg_table('lake', 't')"))
    }
    assert(ex.getMessage.contains("rolled back") ||
      Option(ex.getCause).exists(_.getMessage.contains("rolled back")))

    // failed-sync atomicity: a NEW snapshot carrying a delete manifest
    // alongside a schema evolution — the refresh throws and the declared
    // schema must NOT have moved
    val before = e.catalog.declaredSchema("lake", "t").get
    val ml3 = IcebergFixture.writeManifestList(conf2, mdir, 9003L,
      Seq(IcebergFixture.writeManifest(conf2, mdir, 9003L, Seq(fr1, fr2))),
      content = 1)
    val json2 = IcebergFixture.metadataJson(2, loc.toUri.toString,
      Seq((1, "id", "long"), (2, "name", "string"), (4, "extra", "long")),
      Seq((SnapRef(9001L, 1700000000000L, Seq(fr1)), ml1),
        (SnapRef(9002L, 1700000100000L, Seq(fr1, fr2)), ml2),
        (SnapRef(9003L, 1700000200000L, Seq(fr1, fr2)), ml3)),
      currentSnapshotId = 9003L)
    val out2 = fs.create(new Path(mdir, "v1.metadata.json"), true)
    out2.write(json2.getBytes("UTF-8")); out2.close()
    intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement("CALL system.refresh_iceberg_table('lake', 't')"))
    }
    assert(e.catalog.declaredSchema("lake", "t").get === before)
  }

  test("hint-less metadata discovery sorts version numbers numerically (v9 < v12)") {
    val loc = new Path(tmpDir("ice-vsort"))
    val mdir = new Path(loc, "metadata")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(mdir)
    Seq("v1", "v9", "v12", "v2").foreach { v =>
      val o = fs.create(new Path(mdir, s"$v.metadata.json"), true)
      o.write("{}".getBytes("UTF-8")); o.close()
    }
    assert(IcebergInterop.currentMetadataPath(fs, loc).getName === "v12.metadata.json")
    // the NNNNN-uuid scheme keeps working (13 > 12 numerically)
    Seq("00005-abc", "00013-def").foreach { v =>
      val o = fs.create(new Path(mdir, s"$v.metadata.json"), true)
      o.write("{}".getBytes("UTF-8")); o.close()
    }
    assert(IcebergInterop.currentMetadataPath(fs, loc).getName === "00013-def.metadata.json")
  }

  test("__mv_ column names are reserved at CREATE (the engine conceals them on reads)") {
    val e = engine("ice-reserved-wh")
    e.executeNonQuery(SqlStatement("CREATE SCHEMA lake"))
    val ex = intercept[GraftQueryException] {
      e.executeNonQuery(SqlStatement(
        "CREATE TABLE lake.bad (id bigint, __mv_note varchar)"))
    }
    assert(ex.getMessage.contains("__mv_") ||
      Option(ex.getCause).exists(_.getMessage.contains("__mv_")))
  }

  test("metadata parsing: schemas, snapshots, unsupported types fail loud") {
    val json = IcebergFixture.metadataJson(2, "/x",
      Seq((1, "id", "long"), (2, "ts", "timestamptz"), (3, "d", "decimal(10,2)")),
      Nil, -1L)
    val meta = IcebergInterop.parseMetadata(json)
    assert(meta.formatVersion === 2)
    assert(meta.schema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(
      ("id", LongType), ("ts", TimestampType), ("d", DecimalType(10, 2))))
    assert(meta.schema.fields.map(_.metadata.getLong(IcebergInterop.FieldIdKey))
      .toSeq === Seq(1L, 2L, 3L))
    // uuid/fixed parse since round 13 (uuid → string canonical render,
    // fixed[n] → binary); `time` remains genuinely unsupported
    val u = IcebergInterop.parseMetadata(IcebergFixture.metadataJson(2, "/x",
      Seq((1, "u", "uuid"), (2, "f", "fixed[16]")), Nil, -1L))
    assert(u.schema.fields.map(_.dataType).toSeq === Seq(StringType, BinaryType))
    assert(u.fields.head.rawType === "uuid")
    val bad = IcebergFixture.metadataJson(2, "/x", Seq((1, "t", "time")), Nil, -1L)
    intercept[IllegalArgumentException] { IcebergInterop.parseMetadata(bad) }
  }
}
