package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manifest-tier bloom-filter file skipping (`bloom_filter_columns`,
  * Trino Iceberg's `parquet_bloom_filter_columns`): per-file equality
  * blooms built at commit time let point predicates skip whole files
  * even when every file's min/max bounds overlap — the point-lookup-on-
  * unsorted-high-cardinality-key case where range bounds prune nothing.
  * Interleaved id layouts below make bounds provably useless (every file
  * spans the full range), so any pruning observed is the bloom's.
  */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-bloom-wh"))
    c.createSchema("s")
    c
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("tag", StringType),
    StructField("v", LongType)))

  /** Three single-file commits with INTERLEAVED SPARSE ids (file i holds
    * ids ≡ i mod 6, i in 0..2, over 0..176): all three bounds are
    * [i, 174+i] — a point predicate can never be bounds-pruned — and
    * residues 3-5 mod 6 (e.g. 45) exist in NO file while sitting inside
    * every file's bounds.
    */
  private def seed(c: SnapshotCatalog, table: String): Unit = {
    c.createTable("s", table, schema,
      bloomFilterColumns = Seq("id", "tag"))
    (0 until 3).foreach { i =>
      c.insert("s", table,
        (0 until 30).map(k => (6L * k + i, s"tag-${6 * k + i}", k.toLong))
          .toDF("id", "tag", "v").coalesce(1))
    }
  }

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one file scan, got ${scans.size}")
    scans.head
  }

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    scanOf(df).metrics("numFiles").value
  }

  test("blooms land in manifest entries and survive the JSON round-trip") {
    val c = freshCatalog()
    seed(c, "t0")
    val entries = c.manifestEntries("s", "t0", c.snapshots("s", "t0").last)
    assert(entries.size == 3)
    entries.foreach { e =>
      assert(e.blooms.keySet.map(_.toLowerCase) == Set("id", "tag"))
      assert(e.blooms("id").dtype == LongType.sql)
      assert(e.blooms("tag").dtype == StringType.sql)
      assert(e.blooms("id").bits.length ==
        (Manifests.bloomBitsFor(e.rows) / 64).toInt)
    }
    val replayed = Manifests.fromJson(Manifests.toJson(entries))
    assert(replayed.map(_.blooms("id").bits.toSeq) ==
      entries.map(_.blooms("id").bits.toSeq))
    // the filter actually contains what was written
    val (h1, h2) = Manifests.bloomHashes(6L, LongType)
    assert(entries.exists(_.blooms("id").mightContain(h1, h2)))
  }

  test("point predicate on an unsorted long key reads one file where bounds read all three") {
    val c = freshCatalog()
    seed(c, "t1")
    // bounds overlap totally: without blooms every probe hits 3 files
    val hit = c.readLatest("s", "t1").filter(col("id") === 43L)
    assert(hit.select("tag").as[String].collect().toSeq == Seq("tag-43"))
    assert(filesRead(c.readLatest("s", "t1").filter(col("id") === 43L)) == 1)
    // absent value (in-range, so bounds keep everything): zero files
    assert(filesRead(c.readLatest("s", "t1").filter(col("id") === 45L)) == 0)
    assert(c.readLatest("s", "t1").filter(col("id") === 45L).count() == 0)
  }

  test("string-key equality and IN-lists prune by bloom") {
    val c = freshCatalog()
    seed(c, "t2")
    assert(filesRead(c.readLatest("s", "t2").filter(col("tag") === "tag-43")) == 1)
    // IN over values from two of the three files
    val in2 = c.readLatest("s", "t2").filter(col("id").isin(42L, 43L))
    assert(in2.count() == 2)
    assert(filesRead(c.readLatest("s", "t2").filter(col("id").isin(42L, 43L))) == 2)
  }

  test("DML probe skips bloom-excluded files: a point DELETE rewrites one file") {
    val c = freshCatalog()
    seed(c, "t3")
    val before = c.dataFilePaths("s", "t3", c.snapshots("s", "t3").last).toSet
    c.delete("s", "t3", col("id") === 43L)
    val after = c.dataFilePaths("s", "t3", c.snapshots("s", "t3").last).toSet
    // two of the three original files carry by path — only id=43's file
    // was rewritten, proven by the bloom (bounds alone keep all three)
    assert((before intersect after).size == 2)
    assert(c.readLatest("s", "t3").count() == 89)
  }

  test("rewritten files get fresh blooms and stay prunable") {
    val c = freshCatalog()
    seed(c, "t4")
    c.update("s", "t4", Seq("v" -> lit(999L)), col("id") === 43L)
    assert(filesRead(c.readLatest("s", "t4").filter(col("id") === 43L)) == 1)
    assert(c.readLatest("s", "t4").filter(col("id") === 43L)
      .select("v").as[Long].head() == 999L)
    // compaction folds to one file, whose new bloom still answers probes
    c.compact("s", "t4")
    assert(filesRead(c.readLatest("s", "t4").filter(col("id") === 45L)) == 0)
    assert(c.readLatest("s", "t4").count() == 90)
  }

  test("bloom config follows column DDL: rename keeps building, drop stops") {
    val c = freshCatalog()
    seed(c, "t5")
    c.renameColumn("s", "t5", "id", "doc_id")
    assert(c.bloomColumns("s", "t5").map(_.toLowerCase).contains("doc_id"))
    c.insert("s", "t5",
      (0 until 10).map(k => (1000L + 2 * k, s"x$k", 0L)).toDF("doc_id", "tag", "v")
        .coalesce(1))
    // the NEW commit's file carries a doc_id bloom
    val latest = c.manifestEntries("s", "t5", c.snapshots("s", "t5").last)
    assert(latest.exists(_.blooms.keySet.exists(_.equalsIgnoreCase("doc_id"))))
    // pre-rename files keep name-keyed metadata under "id", so a doc_id
    // probe keeps them ALL (conservative) — but the new file's bloom
    // still answers: an odd id inside its [1000,1018] bounds skips it
    // (3 of 4 read, and only the bloom can prove that)
    assert(filesRead(c.readLatest("s", "t5").filter(col("doc_id") === 1004L)) == 4)
    assert(filesRead(c.readLatest("s", "t5").filter(col("doc_id") === 1005L)) == 3)
    c.dropColumn("s", "t5", "doc_id")
    assert(!c.bloomColumns("s", "t5").exists(_.equalsIgnoreCase("doc_id")))
  }

  test("SQL DDL property parses: parquet_bloom_filter_columns ARRAY") {
    val c = freshCatalog()
    val engine = new graft.GraftEngine(spark, c.warehouse)
    engine.executeNonQuery(graft.params.SqlStatement(
      """CREATE TABLE s.ddl_bloom (id BIGINT, tag VARCHAR)
        |WITH (parquet_bloom_filter_columns = ARRAY['id'])""".stripMargin))
    assert(c.bloomColumns("s", "ddl_bloom") == Seq("id"))
    // SHOW CREATE TABLE round-trips the property
    val ddl = engine.query(graft.params.SqlStatement(
      "SHOW CREATE TABLE s.ddl_bloom")).collect().head.getString(0)
    assert(ddl.contains("parquet_bloom_filter_columns = ARRAY['id']"))
    val bad = intercept[Exception] {
      engine.executeNonQuery(graft.params.SqlStatement(
        "CREATE TABLE s.ddl_bloom2 (id BIGINT) " +
          "WITH (bloom_filter_columns = ARRAY['nope'])"))
    }
    assert(bad.getMessage.toLowerCase.contains("bloom"))
  }
}
