package graft.catalog

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-10 authority-URI coverage: every path-sensitive surface runs
  * at least once over `mock://bucket/…` URIs (scheme WITH authority,
  * the s3a/hdfs shape) instead of the authority-less `file:/` every
  * other spec uses — the exact blind spot where eq-deletes once
  * silently stopped applying (round-8 advisor finding).
  */
class AuthorityUriSpec extends SparkSpec {

  private def mountMock(): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mock.impl", classOf[MockAuthorityFileSystem].getName)
    hc.set("fs.AbstractFileSystem.mock.impl", classOf[MockAbstractFileSystem].getName)
  }

  private def mockDir(bucket: String, prefix: String): String = {
    val local = tmpDir(prefix)
    s"mock://$bucket$local"
  }

  test("basic mock:// round trip: write, list, qualified paths keep the authority") {
    mountMock()
    val d = mockDir("bukkit", "graft_mockfs_rt")
    val p = new Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.getUri.toString == "mock://bukkit")
    fs.mkdirs(new Path(p, "sub"))
    val q = fs.makeQualified(new Path(p, "sub"))
    assert(q.toString.startsWith("mock://bukkit/"), q.toString)
    spark.range(10).toDF("id").write.parquet(s"$d/sub/data")
    val listed = fs.listStatus(new Path(s"$d/sub/data"))
    assert(listed.nonEmpty)
    listed.foreach(st => assert(st.getPath.toString.startsWith("mock://bukkit/"),
      st.getPath.toString))
    assert(spark.read.parquet(s"$d/sub/data").count() == 10)
  }

  test("eq-deletes apply on an authority-URI warehouse (upsert + compact)") {
    mountMock()
    val wh = mockDir("bukkit", "graft_mockfs_eq")
    val c = new SnapshotCatalog(spark, wh)
    c.createSchema("s")
    import spark.implicits._
    val base = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    c.createTable("s", "t", base.schema, formatVersion = 2)
    c.insert("s", "t", base)
    c.upsert("s", "t", Seq((2, "B"), (4, "d")).toDF("k", "v"), Seq("k"))
    val got = c.readLatest("s", "t").orderBy("k").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a"), (2, "B"), (3, "c"), (4, "d")))
    // second pending delete: the non-uniform coverage (attach-join) path
    c.upsert("s", "t", Seq((1, "A2"), (2, "B2")).toDF("k", "v"), Seq("k"))
    val got2 = c.readLatest("s", "t").orderBy("k").as[(Int, String)].collect().toSeq
    assert(got2 == Seq((1, "A2"), (2, "B2"), (3, "c"), (4, "d")))
    c.compact("s", "t")
    assert(c.snapshots("s", "t").last.eqDeletes.isEmpty)
    val got3 = c.readLatest("s", "t").orderBy("k").as[(Int, String)].collect().toSeq
    assert(got3 == got2)
  }

  test("add_files adoption: external authority-URI files read back with manifest entries") {
    mountMock()
    val wh = mockDir("bukkit", "graft_mockfs_add_wh")
    val ext = mockDir("bukkit", "graft_mockfs_add_ext")
    import spark.implicits._
    Seq((10, "x"), (20, "y")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$ext/batch1")
    val c = new SnapshotCatalog(spark, wh)
    c.createSchema("s")
    c.createTable("s", "adopt", Seq((1, "a")).toDF("k", "v").schema)
    c.insert("s", "adopt", Seq((1, "a")).toDF("k", "v"))
    val n = c.addFiles("s", "adopt", s"$ext/batch1")
    assert(n == 1)
    val got = c.readLatest("s", "adopt").orderBy("k").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a"), (10, "x"), (20, "y")))
    // the adopted entry rides the manifest as an absolute path and the
    // metadata surface serves it without reopening footers
    val snap = c.snapshots("s", "adopt").last
    val adopted = c.manifestEntries("s", "adopt", snap).filter(_.path.startsWith("/"))
    assert(adopted.nonEmpty)
    assert(adopted.forall(_.rows > 0))
  }

  test("migrate adopts an authority-URI hive layout in place") {
    mountMock()
    val wh = mockDir("bukkit", "graft_mockfs_mig_wh")
    val loc = mockDir("bukkit", "graft_mockfs_mig_loc")
    import spark.implicits._
    Seq((1, "a", "r1"), (2, "b", "r1"), (3, "c", "r2")).toDF("k", "v", "part")
      .write.partitionBy("part").parquet(s"$loc/data")
    val c = new SnapshotCatalog(spark, wh)
    c.createSchema("s")
    val n = c.migrateTable("s", "m", s"$loc/data")
    assert(n >= 2)
    val got = c.readLatest("s", "m").select("k", "v", "part")
      .orderBy("k").as[(Int, String, String)].collect().toSeq
    assert(got == Seq((1, "a", "r1"), (2, "b", "r1"), (3, "c", "r2")))
  }

  test("cross-bucket adoption fails LOUD: entries re-anchor on the table's authority") {
    mountMock()
    val wh = mockDir("b1", "graft_mockfs_xb_wh")
    val ext = mockDir("b2", "graft_mockfs_xb_ext")
    import spark.implicits._
    Seq((10, "x")).toDF("k", "v").coalesce(1).write.parquet(s"$ext/batch")
    val c = new SnapshotCatalog(spark, wh)
    c.createSchema("s")
    c.createTable("s", "t", Seq((1, "a")).toDF("k", "v").schema)
    c.insert("s", "t", Seq((1, "a")).toDF("k", "v"))
    val ex = intercept[IllegalArgumentException] {
      c.addFiles("s", "t", s"$ext/batch")
    }
    assert(ex.getMessage.contains("different filesystem"), ex.getMessage)
    assert(c.readLatest("s", "t").count() == 1L) // nothing committed
  }

  test("unload exports cross-bucket: mock://b1 table to mock://b2 target, bare parquet") {
    mountMock()
    val src = mockDir("b1", "graft_mockfs_un_src")
    val dst = mockDir("b2", "graft_mockfs_un_dst")
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    df.write.parquet(s"$src/tbl")
    val un = new graft.unload.Unloader(spark)
    val resp = un.unload(spark.read.parquet(s"$src/tbl"), s"$dst/out")
    assert(resp.rowCount == 2)
    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(s"$dst/out")).map(_.getPath.getName)
    assert(files.nonEmpty && files.forall(_.endsWith(".parquet")), files.toSeq)
    assert(spark.read.parquet(s"$dst/out").orderBy("k")
      .as[(Int, String)].collect().toSeq == Seq((1, "a"), (2, "b")))
  }
}
