package graft.streaming

import graft.SparkSpec
import graft.catalog.SnapshotCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The streaming SOURCE over catalog tables ([[GraftTableSource]]) and the
  * exactly-once transactional sink ([[EventStreams.streamIntoCatalog]]'s
  * `txnAppId`): commit-log-tailed incremental reads, checkpoint resume,
  * admission control, the non-append-commit contract, CDC mode, and the
  * table→stream→table pipeline surviving a LOST checkpoint without
  * duplicating a row.
  */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schemaT = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("v", LongType)))

  private def rows(ids: Range, grp: String): DataFrame =
    ids.map(i => (i.toLong, grp, i.toLong * 10)).toDF("id", "grp", "v")

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-stream-wh"))
    c.createSchema("s")
    c
  }

  private def sourceOf(c: SnapshotCatalog, table: String,
                       extra: (String, String)*): DataFrame =
    spark.readStream.format("graft-table")
      .option("warehouse", c.warehouse).option("schema", "s").option("table", table)
      .options(extra.toMap)
      .load()

  private def runToTable(src: DataFrame, c: SnapshotCatalog, sink: String,
                         checkpoint: String, txnAppId: Option[String] = None): Unit = {
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) c.insert("s", sink, batch, txnAppId.map(_ -> batchId))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
  }

  private def contents(c: SnapshotCatalog, t: String): Set[(Long, String, Long)] =
    c.readLatest("s", t).as[(Long, String, Long)].collect().toSet

  test("append stream backfills history, then resumes incrementally from the checkpoint") {
    val c = freshCatalog()
    c.createTable("s", "a", schemaT)
    c.createTable("s", "b", schemaT)
    c.insert("s", "a", rows(0 until 10, "x"))
    c.insert("s", "a", rows(10 until 15, "y"))
    val ckpt = tmpDir("graft-stream-ckpt")

    runToTable(sourceOf(c, "a"), c, "b", ckpt)
    assert(contents(c, "b") == contents(c, "a"))
    val snapsAfterFirst = c.snapshots("s", "b").size

    // no new data: a re-run moves nothing (offset checkpoint honored)
    runToTable(sourceOf(c, "a"), c, "b", ckpt)
    assert(c.snapshots("s", "b").size == snapsAfterFirst)

    // new commit on the source: only ITS rows flow (sink grows by one
    // append; contents stay equal)
    c.insert("s", "a", rows(15 until 18, "z"))
    runToTable(sourceOf(c, "a"), c, "b", ckpt)
    assert(contents(c, "b") == contents(c, "a"))
    assert(contents(c, "b").size == 18)
    val appends = c.snapshots("s", "b").count(_.operation.contains("append"))
    assert(appends == snapsAfterFirst + 1 - 0)
  }

  test("txnAppId makes the sink exactly-once even when the checkpoint is lost") {
    val c = freshCatalog()
    c.createTable("s", "a", schemaT)
    c.createTable("s", "b", schemaT)
    c.insert("s", "a", rows(0 until 20, "x"))
    c.insert("s", "a", rows(20 until 30, "y"))

    runToTable(sourceOf(c, "a"), c, "b", tmpDir("ckpt-1"), txnAppId = Some("pipe-1"))
    val after1 = contents(c, "b")
    assert(after1 == contents(c, "a"))
    val snaps1 = c.snapshots("s", "b").size

    // checkpoint LOST: a fresh run replays from batch 0 — every batch id
    // is already recorded for pipe-1, so nothing lands twice
    runToTable(sourceOf(c, "a"), c, "b", tmpDir("ckpt-2"), txnAppId = Some("pipe-1"))
    assert(contents(c, "b") == after1)
    assert(c.snapshots("s", "b").size == snaps1)

    // WITHOUT txnAppId the same replay duplicates (the contract the txn
    // exists to fix) — verified so the spec proves the mechanism, not luck
    runToTable(sourceOf(c, "a"), c, "b", tmpDir("ckpt-3"), txnAppId = None)
    assert(c.readLatest("s", "b").count() == after1.size * 2L)
  }

  test("startingTimestamp streams only commits at or after the instant") {
    val c = freshCatalog()
    c.createTable("s", "a", schemaT)
    c.createTable("s", "b", schemaT)
    c.insert("s", "a", rows(0 until 5, "old"))
    val cut = c.insert("s", "a", rows(5 until 8, "mid")).committedAtMillis
    c.insert("s", "a", rows(8 until 10, "new"))

    runToTable(sourceOf(c, "a", "startingTimestamp" -> cut.toString), c, "b",
      tmpDir("ckpt-ts"))
    // the commit AT the cut instant streams; the one before it does not
    assert(contents(c, "b").map(_._2) == Set("mid", "new"))
    assert(contents(c, "b").size == 5)
  }

  test("maxSnapshotsPerTrigger paces one commit per micro-batch") {
    val c = freshCatalog()
    c.createTable("s", "a", schemaT)
    c.createTable("s", "b", schemaT)
    (0 until 3).foreach(i => c.insert("s", "a", rows(i * 5 until (i + 1) * 5, s"g$i")))

    runToTable(sourceOf(c, "a", "maxSnapshotsPerTrigger" -> "1"), c, "b",
      tmpDir("ckpt-paced"), txnAppId = Some("paced"))
    assert(contents(c, "b") == contents(c, "a"))
    // one sink append per source commit — three paced batches, not one big one
    assert(c.snapshots("s", "b").count(_.operation.contains("append")) == 3)
    // pacing stamps batch ids 0,1,2 for the txn writer
    assert(c.lastTxnVersion("s", "b", "paced").contains(2L))
  }

  test("maxBytesPerTrigger paces by commit bytes; an oversized commit still admits") {
    val c = freshCatalog()
    c.createTable("s", "a", schemaT)
    c.createTable("s", "b", schemaT)
    (0 until 3).foreach(i => c.insert("s", "a", rows(i * 5 until (i + 1) * 5, s"g$i")))
    // every commit exceeds a 1-byte cap → the soft-max progress rule
    // admits exactly ONE commit per micro-batch (commits vary by orders
    // of magnitude in bytes, so count-based pacing alone cannot bound a
    // batch's input size)
    runToTable(sourceOf(c, "a", "maxBytesPerTrigger" -> "1"), c, "b",
      tmpDir("ckpt-bytes"), txnAppId = Some("bytepaced"))
    assert(contents(c, "b") == contents(c, "a"))
    assert(c.snapshots("s", "b").count(_.operation.contains("append")) == 3)
    assert(c.lastTxnVersion("s", "b", "bytepaced").contains(2L))
    // a cap far above total size drains everything in one batch
    val c2 = freshCatalog()
    c2.createTable("s", "a", schemaT)
    c2.createTable("s", "b", schemaT)
    (0 until 3).foreach(i => c2.insert("s", "a", rows(i * 5 until (i + 1) * 5, s"g$i")))
    runToTable(sourceOf(c2, "a", "maxBytesPerTrigger" -> s"${1L << 30}"), c2, "b",
      tmpDir("ckpt-bytes-big"), txnAppId = Some("bytebig"))
    assert(contents(c2, "b") == contents(c2, "a"))
    assert(c2.lastTxnVersion("s", "b", "bytebig").contains(0L)) // one batch
    // a cap of ~two small commits' bytes admits two, then one
    val sizeOf = {
      val snaps = c.snapshots("s", "a")
      snaps.zip(None +: snaps.map(Some(_))).map { case (s, p) =>
        // re-derive per-commit bytes from the public metadata surface
        val all = c.manifestEntries("s", "a", s).map(e => e.path -> e.bytes).toMap
        val prev = p.map(pp => c.manifestEntries("s", "a", pp).map(_.path).toSet)
          .getOrElse(Set.empty)
        all.filterNot(kv => prev(kv._1)).values.sum
      }
    }
    val twoCap = sizeOf.take(2).sum
    val c3 = freshCatalog()
    c3.createTable("s", "a", schemaT)
    c3.createTable("s", "b", schemaT)
    (0 until 3).foreach(i => c3.insert("s", "a", rows(i * 5 until (i + 1) * 5, s"g$i")))
    runToTable(sourceOf(c3, "a", "maxBytesPerTrigger" -> twoCap.toString), c3, "b",
      tmpDir("ckpt-bytes-two"), txnAppId = Some("bytetwo"))
    assert(contents(c3, "b") == contents(c3, "a"))
    assert(c3.lastTxnVersion("s", "b", "bytetwo").contains(1L)) // two batches
  }

  test("non-append commits fail the stream by default and are dropped whole with skipChangeCommits") {
    val c = freshCatalog()
    c.createTable("s", "a", schemaT)
    c.createTable("s", "b", schemaT)
    c.createTable("s", "b2", schemaT)
    c.insert("s", "a", rows(0 until 10, "x"))
    c.delete("s", "a", col("id") < lit(3L)) // CoW rewrite commit
    c.insert("s", "a", rows(10 until 12, "y"))

    val failed = intercept[Exception] {
      runToTable(sourceOf(c, "a"), c, "b", tmpDir("ckpt-fail"))
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(failed).exists(t =>
      Option(t.getMessage).exists(_.contains("not append-only"))))

    runToTable(sourceOf(c, "a", "skipChangeCommits" -> "true"), c, "b2",
      tmpDir("ckpt-skip"))
    // the delete commit is skipped WHOLE: rows 0-2 (deleted in `a`) still
    // stream from commit 1; commit 3's appends arrive; the rewrite
    // commit's re-written files are NOT re-emitted
    val expect = (0 until 10).map(i => (i.toLong, "x", i * 10L)).toSet ++
      (10 until 12).map(i => (i.toLong, "y", i * 10L))
    assert(contents(c, "b2") == expect)
  }

  test("readChangeFeed streams row-level changes matching readChanges") {
    val c = freshCatalog()
    c.createTable("s", "a", schemaT)
    c.insert("s", "a", rows(0 until 8, "x"))
    c.delete("s", "a", col("id") >= lit(6L))
    c.insert("s", "a", rows(8 until 10, "y"))
    val latest = c.snapshots("s", "a").last.snapshotId

    val got = collection.mutable.ArrayBuffer[(Long, String, Long, String, Long)]()
    val q = sourceOf(c, "a", "readChangeFeed" -> "true").writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-cdc"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got ++= batch.select("id", "grp", "v", "_change_type", "_commit_snapshot_id")
          .as[(Long, String, Long, String, Long)].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val expect = c.readChanges("s", "a", 0L, latest)
      .select("id", "grp", "v", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, Long, String, Long)].collect()
    assert(got.sorted.toSeq == expect.sorted.toSeq)
    // the delete commit is represented, not skipped
    assert(got.exists(_._4 == "delete"))
  }

  test("writeStream.format(graft-table) sink: append + exactly-once + upsert modes") {
    val c = freshCatalog()
    c.createTable("s", "a", schemaT)
    c.createTable("s", "b", schemaT)
    c.insert("s", "a", rows(0 until 10, "x"))

    def run(mode: Seq[(String, String)], ckpt: String): Unit = {
      val q = sourceOf(c, "a").writeStream
        .format("graft-table")
        .option("warehouse", c.warehouse).option("schema", "s").option("table", "b")
        .option("txnAppId", "sink-api")
        .options(mode.toMap)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    run(Nil, tmpDir("ckpt-sink1"))
    assert(contents(c, "b") == contents(c, "a"))
    val snaps = c.snapshots("s", "b").size
    // lost checkpoint + same txnAppId: nothing lands twice
    run(Nil, tmpDir("ckpt-sink2"))
    assert(contents(c, "b") == contents(c, "a"))
    assert(c.snapshots("s", "b").size == snaps)

    // upsert mode merges on key with last-per-seq collapse
    val dimSchema = schemaT.add("seq", LongType)
    c.createTable("s", "dim2", dimSchema)
    c.insert("s", "dim2",
      (0 until 4).map(i => (i.toLong, "old", 0L, 0L)).toDF("id", "grp", "v", "seq"))
    val in = tmpDir("sink-upsert-in")
    Seq((1L, "v1", 10L, 1L), (1L, "v2", 20L, 2L), (9L, "v2", 90L, 1L))
      .toDF("id", "grp", "v", "seq").write.mode("overwrite").parquet(in)
    val q2 = spark.readStream.schema(dimSchema).parquet(in).writeStream
      .format("graft-table")
      .option("warehouse", c.warehouse).option("schema", "s").option("table", "dim2")
      .option("mode", "upsert").option("key", "id").option("seqCol", "seq")
      .option("checkpointLocation", tmpDir("ckpt-sink3"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val got = c.readLatest("s", "dim2").as[(Long, String, Long, Long)].collect().toSet
    assert(got.contains((1L, "v2", 20L, 2L)) && got.contains((9L, "v2", 90L, 1L)))
    assert(got.size == 5)
  }

  test("streaming upsert sink with txnAppId applies each batch's MERGE once") {
    val c = freshCatalog()
    val dimSchema = schemaT.add("seq", LongType)
    c.createTable("s", "dim", dimSchema)
    c.insert("s", "dim",
      (0 until 5).map(i => (i.toLong, "old", i * 10L, 0L)).toDF("id", "grp", "v", "seq"))

    // two versions of key 1 in one batch — max_by(seq) must keep seq=2
    val updates = Seq((1L, "mid", 100L, 1L), (1L, "new", 111L, 2L), (7L, "new", 777L, 2L))
      .toDF("id", "grp", "v", "seq")
    val in = tmpDir("upsert-in")
    updates.write.mode("overwrite").parquet(in)
    def run(): Unit = {
      val q = EventStreams.streamUpsertIntoCatalog(
        spark.readStream.schema(updates.schema).parquet(in),
        c, "s", "dim", key = "id", seqCol = "seq", txnAppId = Some("dim-cdc"))
      q.awaitTermination(120000)
    }
    def state(): Set[(Long, String, Long, Long)] =
      c.readLatest("s", "dim").as[(Long, String, Long, Long)].collect().toSet

    run()
    val after1 = state()
    assert(after1.contains((1L, "new", 111L, 2L)) && after1.contains((7L, "new", 777L, 2L)))
    assert(after1.size == 6)
    val snaps1 = c.snapshots("s", "dim").size

    // replay without any checkpoint: the merge batch is txn-skipped
    run()
    assert(state() == after1)
    assert(c.snapshots("s", "dim").size == snaps1)
  }

  test("history.expire.min-snapshots-to-keep floors expiry so a lagging stream resumes") {
    val c = freshCatalog()
    c.createTable("s", "a", schemaT)
    c.createTable("s", "b", schemaT)
    c.insert("s", "a", rows(0 until 5, "x"))
    val ckpt = tmpDir("graft-stream-floor-ckpt")
    runToTable(sourceOf(c, "a"), c, "b", ckpt) // checkpoint at snapshot 1
    // the ENFORCED operating contract: retention floor >= checkpoint lag
    val e = new graft.GraftEngine(spark, c.warehouse)
    e.executeNonQuery(graft.params.SqlStatement(
      "ALTER TABLE s.a SET PROPERTIES " +
        "history.expire.min-snapshots-to-keep = '8'"))
    c.insert("s", "a", rows(5 until 8, "y"))
    c.insert("s", "a", rows(8 until 9, "z"))
    // the same aggressive expiry that broke the un-floored stream is a
    // bounded trim here: the floor keeps the offset snapshot
    c.expireSnapshots("s", "a", Long.MaxValue)
    assert(c.snapshots("s", "a").exists(_.snapshotId == 1L))
    runToTable(sourceOf(c, "a"), c, "b", ckpt)
    assert(contents(c, "b") == contents(c, "a"))
    // the property round-trips through $properties
    assert(c.propertiesMeta("s", "a").collect()
      .exists(r => r.getString(0) == "history.expire.min-snapshots-to-keep" &&
        r.getString(1) == "8"))
  }

  test("expiring the checkpointed offset's snapshot fails the stream LOUD, never a silent gap") {
    val c = freshCatalog()
    c.createTable("s", "a", schemaT)
    c.createTable("s", "b", schemaT)
    c.insert("s", "a", rows(0 until 5, "x"))
    val ckpt = tmpDir("graft-stream-expired-ckpt")
    runToTable(sourceOf(c, "a"), c, "b", ckpt) // checkpoint at snapshot 1
    // maintenance violates the operating contract: retention shorter
    // than the stream's checkpoint lag expires the offset snapshot
    c.insert("s", "a", rows(5 until 8, "y"))
    c.insert("s", "a", rows(8 until 9, "z"))
    c.expireSnapshots("s", "a",
      c.snapshots("s", "a").last.committedAtMillis)
    assert(!c.snapshots("s", "a").exists(_.snapshotId == 1L))
    // the resumed stream must fail loud (Iceberg-parity: incremental
    // reads from an expired snapshot are an error) — never re-emit or
    // silently skip rows
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runToTable(sourceOf(c, "a"), c, "b", ckpt)
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(ex).exists(_.contains("does not exist")),
      s"expected the expired-snapshot failure, got: ${rootMessages(ex)}")
    // the sink holds exactly the pre-expiry drain: nothing duplicated
    assert(contents(c, "b") == rows(0 until 5, "x")
      .as[(Long, String, Long)].collect().toSet)
  }
}
