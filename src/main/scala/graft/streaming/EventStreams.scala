package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double)

final case class SessionSummary(user_id: Long, n_events: Long, total_value: Double,
                                start_ms: Long, end_ms: Long)

/** Structured Streaming surface over the events table (SURVEY.md §2.6
  * extensions): watermarked tumbling-window aggregation and stateful
  * sessionization.
  *
  * The batch twin of `windowedCounts` is `Windows.windowTumblingEpoch`,
  * which the differential oracle checks; the streaming path is exercised by
  * ScalaTest against the same parquet via a file-source stream.
  *
  * Scale notes: both queries are keyed state — window×type for the
  * aggregation, user for sessions — so state partitions by key and the
  * watermark bounds state size. No global ordering is ever required.
  */
object EventStreams {

  val eventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  /** File-source stream over a directory of event parquet (one file = one
    * micro-batch in tests).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling 5-minute windowed counts/sums with a 10-minute watermark —
    * late events beyond the watermark are dropped, state is bounded.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,4)")).cast("decimal(18,4)").as("total_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup — the continuous-ingest counterpart of
    * graft.operators.Dedup.dedupByFingerprint: an 8-byte xxhash64
    * fingerprint of the content keys `dropDuplicatesWithinWatermark`, so
    * a re-delivered or re-crawled record inside the watermark horizon is
    * emitted once. State holds one key per distinct fingerprint seen
    * within the watermark and is expired past it — bounded at any ingest
    * rate, unlike an unwatermarked dropDuplicates whose state grows with
    * the corpus forever.
    */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withColumn("fp",
        xxhash64(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Session windows via native session_window: events within 30 minutes of
    * each other merge into one session.
    */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n_events"))

  /** Stream into a snapshot-catalog table: every micro-batch commits one
    * time-travel-visible snapshot via foreachBatch — streaming ingestion
    * with full lakehouse semantics (then `compact` + `expireSnapshots`
    * handle the small-files lifecycle).
    *
    * Exactly-once: pass `txnAppId` and each micro-batch commits with the
    * transactional identity `(txnAppId, batchId)` — the catalog skips any
    * batch id it has already recorded for that writer
    * ([[graft.catalog.SnapshotCatalog.insert]]), so a replayed batch
    * (failure between commit and checkpoint write, or a LOST checkpoint
    * re-running from batch 0) appends nothing twice. Without `txnAppId`,
    * exactly-once degrades to the checkpoint's at-least-once contract: a
    * restarted AvailableNow run with no checkpoint re-reads the input and
    * appends duplicate snapshots (verified behavior).
    */
  def streamIntoCatalog(events: DataFrame,
                        catalog: graft.catalog.SnapshotCatalog,
                        schema: String, table: String,
                        txnAppId: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          catalog.insert(schema, table, batch, txnAppId.map(_ -> batchId))
        }
        () // Unit for the Scala overload
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** CDC-style streaming UPSERT: each micro-batch MERGEs into the catalog
    * table on `key` instead of blind-appending — the streaming ingest mode
    * for mutable entities (latest state per key), vs [[streamIntoCatalog]]
    * for immutable facts. A batch may carry several versions of one key
    * (the stream is ordered within a batch), so the batch is first
    * collapsed to its last row per key via max_by over a monotonic
    * sequence column — without this the catalog's at-most-one-match MERGE
    * rule would (correctly) reject the batch.
    *
    * Scale shape: per micro-batch one key-collapse shuffle plus the MERGE
    * full-outer join; state lives entirely in the table, not the state
    * store, so an unbounded run carries no streaming state at all.
    */
  def streamUpsertIntoCatalog(events: DataFrame,
                              catalog: graft.catalog.SnapshotCatalog,
                              schema: String, table: String,
                              key: String, seqCol: String,
                              txnAppId: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val latest = batch
            .groupBy(col(key))
            .agg(max_by(struct(batch.columns.map(col).toIndexedSeq: _*), col(seqCol)).as("r"))
            .select(col("r.*"))
          catalog.merge(schema, table, latest, key, txnAppId.map(_ -> batchId))
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Stream-static enrichment: the event stream joined to a static
    * dimension (user_id → customer attributes). Spark re-plans the static
    * side per micro-batch, so at scale the dimension is broadcast (pinned
    * here with an explicit hint) and the stream never shuffles — the
    * standard "decorate events with reference data" ingest stage. No
    * watermark is needed: a stream-static inner join is stateless.
    */
  def enrichWithDimension(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      broadcast(dim),
      events("user_id") === dim("c_custkey"), "inner")
      .select(events("event_id"), events("ts"), events("user_id"),
        events("event_type"), events("value"),
        dim("c_mktsegment").as("segment"))

  /** Stream-stream inner join: purchases matched to the clicks that
    * preceded them by at most 30 minutes, per user — the streaming as-of
    * candidate join. Both sides are watermarked so the state store evicts
    * rows once they can no longer match (clicks after 40 min = watermark +
    * join bound; purchases after 10 min): bounded state, the requirement
    * for an unbounded run.
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "40 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("click_id"), col("p_ts"), col("c_ts"))
  }

  /** Custom stateful sessionization with flatMapGroupsWithState, BATCH
    * mode: Spark invokes the function once per key with the full group, so
    * sessions are split on 30-minute gaps and flushed at end of input. A
    * streaming deployment of the same logic needs
    * `GroupStateTimeout.EventTimeTimeout` + `state.update` between
    * micro-batches (native `session_window` — `sessionWindowAgg` above —
    * is the production streaming path; this demonstrates the custom-state
    * API shape).
    */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionSummary] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionSummary, SessionSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionSummary]) =>
          // batch-mode flatMapGroupsWithState: one invocation per key with
          // the full group; emit one summary per 30-min-gap session
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val gapMs = 30L * 60 * 1000
          val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
          var cur: Option[SessionSummary] = None
          sorted.foreach { e =>
            cur = cur match {
              case Some(s) if e.ts.getTime - s.end_ms <= gapMs =>
                Some(s.copy(n_events = s.n_events + 1,
                  total_value = s.total_value + e.value, end_ms = e.ts.getTime))
              case other =>
                other.foreach(sessions += _)
                Some(SessionSummary(userId, 1, e.value, e.ts.getTime, e.ts.getTime))
            }
          }
          cur.foreach(sessions += _)
          sessions.iterator
      }
  }
}
