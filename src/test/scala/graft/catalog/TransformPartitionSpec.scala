package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Partition transforms (Trino Iceberg hidden partitioning,
  * trino.io/docs/current/connector/iceberg.html#partitioned-tables):
  * `bucket(n, col)`, `truncate(w, col)`, `year/month/day/hour(ts)` in
  * `partitioning = ARRAY[...]`. The table partitions on a DERIVED hive
  * directory value (`ts_month=202303`, `id_bucket=5`) while queries and
  * the user-visible schema keep addressing the SOURCE column — which
  * stays stored in the data files, so footer bounds keep pruning on it,
  * and equality predicates additionally project through the transform
  * to prune on the derived directory value (the only way a hash bucket
  * can prune).
  */
class TransformPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-transform-wh"))
    c.createSchema("s")
    c
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("v", LongType)))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def monthRows = Seq(
    (1L, ts("2023-01-10 00:00:00"), 10L), (2L, ts("2023-01-20 00:00:00"), 20L),
    (3L, ts("2023-02-05 00:00:00"), 30L), (4L, ts("2023-02-25 00:00:00"), 40L),
    (5L, ts("2023-03-15 00:00:00"), 50L), (6L, ts("2023-03-16 00:00:00"), 60L)
  ).toDF("id", "ts", "v")

  test("month(ts): hive layout uses derived dirs; schema stays source-only; reads exact") {
    val c = freshCatalog()
    c.createTable("s", "t", schema, partitionedBy = Seq("month(ts)"))
    c.insert("s", "t", monthRows)
    // physical layout: ts_month=yyyymm dirs inside the snap dir
    val paths = c.dataFilePaths("s", "t", c.snapshots("s", "t").last)
    assert(paths.exists(_.contains("ts_month=202301")), paths.toString)
    assert(paths.exists(_.contains("ts_month=202303")))
    // hidden: the read presents ONLY the declared columns
    val got = c.readLatest("s", "t")
    assert(got.schema.fieldNames.toSeq == Seq("id", "ts", "v"))
    assert(got.count() === 6)
    assert(got.agg(sum("v")).as[Long].head() === 210L)
  }

  test("month(ts): a month-scoped DELETE rewrites only that month's files") {
    val c = freshCatalog()
    c.createTable("s", "t", schema, partitionedBy = Seq("month(ts)"))
    c.insert("s", "t", monthRows)
    val before = c.dataFilePaths("s", "t", c.snapshots("s", "t").last).toSet
    c.delete("s", "t", col("ts") >= lit(ts("2023-02-01 00:00:00")) &&
      col("ts") < lit(ts("2023-03-01 00:00:00")))
    val after = c.dataFilePaths("s", "t", c.snapshots("s", "t").last).toSet
    val rewritten = before.diff(after)
    assert(rewritten.nonEmpty && rewritten.forall(_.contains("ts_month=202302")),
      s"only February files may rewrite, got $rewritten")
    assert(c.readLatest("s", "t").count() === 4)
  }

  test("bucket(n, id): equality DELETE prunes to the key's bucket (transform projection)") {
    val c = freshCatalog()
    c.createTable("s", "b", schema, partitionedBy = Seq("bucket(8, id)"))
    c.insert("s", "b", (1L to 64L).map(k =>
      (k, ts("2023-01-01 00:00:00"), k)).toDF("id", "ts", "v"))
    val snap = c.snapshots("s", "b").last
    val before = c.dataFilePaths("s", "b", snap).toSet
    val buckets = before.flatMap(_.split('/').find(_.startsWith("id_bucket_")))
    assert(buckets.size >= 4, s"64 keys should spread over buckets, got $buckets")
    c.delete("s", "b", col("id") === 17L)
    val after = c.dataFilePaths("s", "b", c.snapshots("s", "b").last).toSet
    val rewritten = before.diff(after)
    val rewrittenBuckets = rewritten.flatMap(_.split('/').find(_.startsWith("id_bucket_")))
    assert(rewrittenBuckets.size === 1,
      s"id=17 lives in ONE bucket; only its files may rewrite, got $rewritten")
    assert(c.readLatest("s", "b").count() === 63)
    assert(c.readLatest("s", "b").filter($"id" === 17L).count() === 0)
  }

  test("truncate(w, s): string prefix dirs; DML and reads compose") {
    val c = freshCatalog()
    val sch = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    c.createTable("s", "tr", sch, partitionedBy = Seq("truncate(2, k)"))
    c.insert("s", "tr", Seq(("alpha", 1L), ("alps", 2L), ("beta", 3L), ("bear", 4L))
      .toDF("k", "v"))
    val paths = c.dataFilePaths("s", "tr", c.snapshots("s", "tr").last)
    assert(paths.exists(_.contains("k_trunc_2=al")) && paths.exists(_.contains("k_trunc_2=be")),
      paths.toString)
    val before = paths.toSet
    c.updateCounted("s", "tr", Seq("v" -> lit(99L)), col("k") === "beta")
    val after = c.dataFilePaths("s", "tr", c.snapshots("s", "tr").last).toSet
    assert(before.diff(after).forall(_.contains("k_trunc_2=be")),
      "only the be-prefix partition may rewrite")
    assert(c.readLatest("s", "tr").filter($"k" === "beta")
      .select("v").as[Long].head() === 99L)
  }

  test("month + bucket composed: a point DELETE prunes BOTH ways") {
    val c = freshCatalog()
    c.createTable("s", "mb", schema,
      partitionedBy = Seq("month(ts)", "bucket(4, id)"))
    c.insert("s", "mb", (1L to 48L).map { k =>
      val m = 1 + ((k - 1) % 3).toInt // months 1..3
      (k, ts(f"2023-0$m%d-10 00:00:00"), k)
    }.toDF("id", "ts", "v"))
    val before = c.dataFilePaths("s", "mb", c.snapshots("s", "mb").last).toSet
    // id=7 → month(ts)=202301 (7 % 3 == 1 → m=1); bucket known to the engine
    c.delete("s", "mb", col("id") === 7L && col("ts") === lit(ts("2023-01-10 00:00:00")))
    val after = c.dataFilePaths("s", "mb", c.snapshots("s", "mb").last).toSet
    val rewritten = before.diff(after)
    assert(rewritten.nonEmpty)
    assert(rewritten.forall(_.contains("ts_month=202301")),
      s"month prune failed: $rewritten")
    assert(rewritten.flatMap(_.split('/').find(_.startsWith("id_bucket_"))).size === 1,
      s"bucket prune failed: $rewritten")
    assert(c.readLatest("s", "mb").count() === 47)
  }

  test("transforms survive MERGE, compact, time travel, and expiry") {
    val c = freshCatalog()
    c.createTable("s", "life", schema, partitionedBy = Seq("month(ts)", "bucket(4, id)"))
    c.insert("s", "life", monthRows)
    val s1 = c.snapshots("s", "life").last
    val src = Seq((1L, 111L), (99L, 999L)).toDF("sid", "sv")
    c.mergeInto("s", "life", src, "t", "u", col("t.id") === col("u.sid"),
      whenMatched = Seq(MergeUpdateAction(None, Seq("v" -> col("u.sv")))),
      whenNotMatched = Seq(MergeInsertAction(None, Some(Seq("id", "ts", "v")),
        Seq(col("u.sid"), lit(ts("2023-04-01 00:00:00")), col("u.sv")))))
    assert(c.readLatest("s", "life").count() === 7)
    assert(c.readLatest("s", "life").filter($"id" === 1L)
      .select("v").as[Long].head() === 111L)
    assert(c.readVersion("s", "life", s1.snapshotId).count() === 6)
    c.compact("s", "life")
    assert(c.readLatest("s", "life").count() === 7)
    assert(c.dataFilePaths("s", "life", c.snapshots("s", "life").last)
      .forall(p => p.contains("ts_month=") && p.contains("id_bucket_")))
    c.expireSnapshots("s", "life", c.snapshots("s", "life").last.committedAtMillis)
    assert(c.readLatest("s", "life").agg(sum("v")).as[Long].head() ===
      (210L - 10L + 111L + 999L))
  }

  test("SQL surface: transformed partitioning parses and SHOW CREATE round-trips") {
    val c = freshCatalog()
    val e = new graft.GraftEngine(spark, c.warehouse)
    e.executeNonQuery(graft.params.SqlStatement(
      """CREATE TABLE s.sqlmb (id bigint, ts timestamp, v bigint)
        |WITH (partitioning = ARRAY['month(ts)', 'bucket(4, id)'])""".stripMargin))
    assert(c.partitionSpec("s", "sqlmb") == Seq("month(ts)", "bucket(4, id)"))
    e.executeNonQuery(graft.params.SqlStatement(
      "INSERT INTO s.sqlmb VALUES (1, TIMESTAMP '2023-05-01 00:00:00', 5)"))
    assert(c.readLatest("s", "sqlmb").count() === 1)
    val ddl = e.query(graft.params.SqlStatement("SHOW CREATE TABLE s.sqlmb"))
      .collect().head.getString(0)
    assert(ddl.contains("month(ts)") && ddl.contains("bucket(4, id)"), ddl)
  }

  test("guards: source-type mismatch and derived-name collision fail at CREATE") {
    val c = freshCatalog()
    intercept[IllegalArgumentException](
      c.createTable("s", "bad1", schema, partitionedBy = Seq("month(v)")))
    intercept[IllegalArgumentException](
      c.createTable("s", "bad2", StructType(Seq(
        StructField("id", LongType), StructField("id_bucket_4", LongType))),
        partitionedBy = Seq("bucket(4, id)")))
    intercept[IllegalArgumentException](
      c.createTable("s", "bad3", schema, partitionedBy = Seq("truncate(2, ts)")))
    // DROP/RENAME of a transform SOURCE column is rejected
    c.createTable("s", "g", schema, partitionedBy = Seq("month(ts)"))
    intercept[IllegalArgumentException](c.dropColumn("s", "g", "ts"))
    intercept[IllegalArgumentException](c.renameColumn("s", "g", "ts", "ts2"))
  }

  test("time transforms are fixed-UTC: a non-UTC session derives and prunes identically") {
    val c = freshCatalog()
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      c.createTable("s", "tz", schema, partitionedBy = Seq("month(ts)"))
      // 2024-03-01T02:00Z is Feb 29 21:00 in New York — a session-zoned
      // derivation would write ts_month=202402 while a UTC probe asks
      // for 202403 and silently prunes the file
      val boundary = java.time.Instant.parse("2024-03-01T02:00:00Z")
      c.insert("s", "tz", Seq((1L, java.sql.Timestamp.from(boundary), 10L))
        .toDF("id", "ts", "v"))
      val paths = c.dataFilePaths("s", "tz", c.snapshots("s", "tz").last)
      assert(paths.exists(_.contains("ts_month=202403")),
        s"UTC-fixed transform must derive 202403, got $paths")
      c.delete("s", "tz", col("ts") === lit(java.sql.Timestamp.from(boundary)))
      assert(c.readLatest("s", "tz").count() == 0L,
        "the probe must find the row whatever the session zone")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("retuned bucket spec never mis-prunes pre-evolution files") {
    import spark.implicits._
    val c = freshCatalog()
    c.createTable("s", "ret", StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))),
      partitionedBy = Seq("bucket(8, id)"))
    c.insert("s", "ret", (1L to 64L).map(k => (k, k)).toDF("id", "v"))
    c.setPartitionSpec("s", "ret", Seq("bucket(16, id)"))
    c.insert("s", "ret", (65L to 96L).map(k => (k, k)).toDF("id", "v"))
    // point lookups across BOTH generations: the parameterized derived
    // name (id_bucket_8 vs id_bucket_16) keeps old files out of the new
    // projection's value space — a mod-16 probe against mod-8 dirs would
    // silently drop rows
    (1L to 96L by 7L).foreach { k =>
      assert(c.readLatest("s", "ret").filter(col("id") === k).count() == 1L,
        s"id=$k must be found across partition-spec generations")
    }
    // and a DELETE through the probe path removes exactly its row
    c.delete("s", "ret", col("id") === 5L)
    assert(c.readLatest("s", "ret").count() == 95L)
  }
}
