package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming specs: drive the windowed aggregation as a real file-source
  * stream (memory sink, processAllAvailable), and check it agrees with the
  * equivalent batch computation over the same data.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val eventsBatch = graft.Tables.events(spark, sf001)

  private def streamDir: String = {
    // re-write events as typed parquet so the file stream sees a clean schema
    val dir = tmpDir("events-stream")
    eventsBatch.select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/in")
    s"$dir/in"
  }

  test("windowed agg over a file stream matches the batch computation") {
    val q = EventStreams.windowedAgg(
        EventStreams.readEventStream(spark, streamDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_out")
      .select($"w_start", $"event_type", $"n", $"total_value")
      .as[(java.sql.Timestamp, String, Long, BigDecimal)].collect().toSet

    val batch = eventsBatch
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(14,4)")).cast("decimal(18,4)").as("total_value"))
      .select($"window.start".as("w_start"), $"event_type", $"n", $"total_value")
      .as[(java.sql.Timestamp, String, Long, BigDecimal)].collect().toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("session_window merges events within the gap") {
    val q = EventStreams.sessionWindowAgg(
        EventStreams.readEventStream(spark, streamDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sess_out")
    assert(got.count() > 0)
    // session invariant: end >= start, events counted
    val bad = got.filter($"s_end" < $"s_start" || $"n_events" <= 0).count()
    assert(bad == 0)
  }

  test("streamingDedup drops re-delivered records within the watermark") {
    // the same micro-batch content delivered TWICE (two identical files):
    // exactly the re-crawl/redelivery shape the operator exists for
    val dir = tmpDir("events-dedup-stream")
    val slice = eventsBatch
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .limit(200).coalesce(1)
    slice.write.mode("overwrite").parquet(s"$dir/in")
    slice.write.mode("append").parquet(s"$dir/in")
    assert(spark.read.parquet(s"$dir/in").count() == 400L)
    val q = EventStreams.streamingDedup(
        EventStreams.readEventStream(spark, s"$dir/in"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("dedup_out")
    assert(out.count() == 200L, "each duplicated record must be emitted exactly once")
    assert(out.select($"event_id").distinct().count() == 200L)
  }

  test("sessionize (flatMapGroupsWithState) splits on 30-minute gaps") {
    val events = Seq(
      Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Event(2, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "view", 2.0),
      // 40-minute gap → new session
      Event(3, java.sql.Timestamp.valueOf("2024-01-01 10:50:00"), 1L, "click", 3.0),
      Event(4, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 2L, "view", 5.0))
      .toDS()
    val got = EventStreams.sessionize(spark, events).collect()
      .sortBy(s => (s.user_id, s.start_ms))
    assert(got.length == 3)
    assert(got(0).user_id == 1L && got(0).n_events == 2 && got(0).total_value == 3.0)
    assert(got(1).user_id == 1L && got(1).n_events == 1 && got(1).total_value == 3.0)
    assert(got(2).user_id == 2L && got(2).n_events == 1)
  }

  test("streaming dedup: duplicated input files collapse to distinct event_ids") {
    val dir = tmpDir("events-dup")
    val typed = eventsBatch
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    // two identical files → every event arrives twice across micro-batches
    typed.coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val f = new java.io.File(s"$dir/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(f.toPath,
      new java.io.File(s"$dir/in/dup-${f.getName}").toPath)

    val q = EventStreams.readEventStream(spark, s"$dir/in")
      .dropDuplicates("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_out").count()
    assert(got == eventsBatch.count())
  }

  test("stream-stream click->purchase join matches the batch join") {
    val q = EventStreams.clickPurchaseJoin(
        EventStreams.readEventStream(spark, streamDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("ssj_out")
      .select($"purchase_id", $"user_id", $"click_id")
      .as[(Long, Long, Long)].collect().toSet

    val clicks = eventsBatch.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"), $"ts".as("c_ts"))
    val purchases = eventsBatch.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"), $"ts".as("p_ts"))
    val batch = purchases.join(clicks,
        $"p_user" === $"c_user" && $"c_ts" <= $"p_ts" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES"))
      .select($"purchase_id", $"p_user", $"click_id")
      .as[(Long, Long, Long)].collect().toSet

    // a single AvailableNow pass over in-order files loses nothing to the
    // watermark, so stream == batch exactly
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("watermark drops events later than 10 minutes behind the max seen ts") {
    import org.apache.spark.sql.types._
    // watermark filtering takes effect ONE batch after the advancing data
    // (verified empirically: a late row in the very next micro-batch still
    // aggregates), so the late file arrives two batches after the
    // watermark-advancing event. FileStreamSource orders files by mtime —
    // pinned explicitly for deterministic batching.
    val dir = tmpDir("late-events")
    def writeFile(rows: Seq[(Long, String)], mtimeAgo: Long, mode: String): Unit = {
      rows.map { case (id, ts) =>
        (id, java.sql.Timestamp.valueOf(ts), 1L, "click", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode(mode).parquet(s"$dir/in")
      new java.io.File(s"$dir/in").listFiles()
        .filter(_.lastModified > System.currentTimeMillis() - 5000)
        .foreach(_.setLastModified(System.currentTimeMillis() - mtimeAgo))
    }
    writeFile(Seq((1L, "2024-01-01 11:00:00"), (2L, "2024-01-01 12:00:00")), 90000, "overwrite")
    writeFile(Seq((3L, "2024-01-01 12:01:00")), 60000, "append") // commits watermark 11:50
    writeFile(Seq((4L, "2024-01-01 10:00:00")), 1000, "append")  // hopelessly late

    val src = spark.readStream.schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = EventStreams.windowedAgg(src)
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val finalized = spark.table("late_out")
      .select($"w_start", $"n").as[(java.sql.Timestamp, Long)].collect().toMap
    // the dropped late event's window must never materialize
    assert(!finalized.contains(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      s"late event must be dropped, got $finalized")
    // and the finalized on-time window holds exactly its one event
    assert(finalized.getOrElse(java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 0L) == 1L)
  }

  test("streaming ingestion commits snapshots; compact + expire reclaims small files") {
    val dir = tmpDir("stream-catalog")
    // two input files → up to maxFilesPerTrigger-bounded micro-batches
    val typed = eventsBatch
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    typed.filter($"event_id" % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in")
    typed.filter($"event_id" % 2 === 1).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")

    val catalog = new graft.catalog.SnapshotCatalog(spark, s"$dir/wh")
    catalog.createSchema("stream")
    catalog.createTable("stream", "events_ingest", typed.schema)

    val src = spark.readStream.schema(typed.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = EventStreams.streamIntoCatalog(src, catalog, "stream", "events_ingest")
    q.awaitTermination(120000)

    val snaps = catalog.snapshots("stream", "events_ingest")
    assert(snaps.size == 2, s"expected 2 micro-batch commits, got ${snaps.size}")
    val total = eventsBatch.count()
    assert(catalog.readLatest("stream", "events_ingest").count() == total)
    // mid-ingestion time travel sees only the first micro-batch
    val atFirst = catalog.readAsOf("stream", "events_ingest",
      snaps.head.committedAtMillis).count()
    assert(atFirst > 0 && atFirst < total, s"atFirst=$atFirst total=$total")

    // compact → one snapshot referencing a single dir; data intact
    val compacted = catalog.compact("stream", "events_ingest")
    val compactedTops = catalog.dataFilePaths("stream", "events_ingest", compacted)
      .map(_.split('/').head).distinct
    assert(compactedTops.size == 1)
    assert(catalog.readLatest("stream", "events_ingest").count() == total)

    // expire pre-compaction history → old snap dirs physically reclaimed
    // (the _manifests metadata dir stays — it is the catalog's, not data)
    catalog.expireSnapshots("stream", "events_ingest", compacted.committedAtMillis)
    val left = new java.io.File(s"$dir/wh/stream/events_ingest").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(left == Set(compactedTops.head, "_manifests"), s"leftover dirs: $left")
    assert(catalog.readLatest("stream", "events_ingest").count() == total)
  }

  test("streaming upsert: per-batch MERGE keeps the latest state per key") {
    val dir = tmpDir("stream-upsert")
    // user-state stream: (user_id, seq, value). Two files → two micro-
    // batches; users 1-3 appear in both (batch 2 must UPDATE them), user 4
    // only in batch 2 (INSERT); user 2 appears TWICE in batch 2 (the
    // in-batch collapse must keep seq 12, not fail the MERGE cardinality
    // rule or keep a stale row).
    val b1 = Seq((1L, 1L, 10.0), (2L, 2L, 20.0), (3L, 3L, 30.0))
      .toDF("user_id", "seq", "value")
    val b2 = Seq((1L, 10L, 11.0), (2L, 11L, 21.0), (2L, 12L, 22.0), (4L, 13L, 40.0))
      .toDF("user_id", "seq", "value")
    b1.coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    b2.coalesce(1).write.mode("append").parquet(s"$dir/in")

    val catalog = new graft.catalog.SnapshotCatalog(spark, s"$dir/wh")
    catalog.createSchema("stream")
    catalog.createTable("stream", "user_state", b1.schema)

    val src = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = EventStreams.streamUpsertIntoCatalog(
      src, catalog, "stream", "user_state", key = "user_id", seqCol = "seq")
    q.awaitTermination(120000)

    val state = catalog.readLatest("stream", "user_state")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    // file source lists files in nondeterministic order: whichever batch
    // came second wins — but user 2's in-batch collapse must ALWAYS have
    // kept the higher seq of its batch, and all 4 keys must exist once
    assert(state.keySet == Set(1L, 2L, 3L, 4L))
    assert(Set(2L, 12L).contains(state(2L)._1)) // never the stale seq 11
    assert(state(4L) == ((13L, 40.0)))
    assert(catalog.readLatest("stream", "user_state").count() == 4)
    // snapshot per micro-batch: 2 MERGE commits
    assert(catalog.snapshots("stream", "user_state").size == 2)
  }

  test("sessionize over the sf corpus: totals conserve events") {
    val typed = eventsBatch
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Event]
    val sessions = EventStreams.sessionize(spark, typed).collect()
    assert(sessions.map(_.n_events).sum == eventsBatch.count())
    assert(sessions.forall(s => s.end_ms >= s.start_ms))
  }

  test("stream-static enrichment matches the batch join, stateless") {
    val dim = graft.Tables.customer(spark, sf001)
      .select($"c_custkey", $"c_mktsegment")
    val q = EventStreams.enrichWithDimension(
        EventStreams.readEventStream(spark, streamDir), dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("enrich_out")
      .select($"event_id", $"segment").as[(Long, String)].collect().toSet
    val batch = eventsBatch.join(dim, eventsBatch("user_id") === dim("c_custkey"))
      .select($"event_id", $"c_mktsegment").as[(Long, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
