package graft.streaming

import graft.catalog.SnapshotCatalog

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, GraftStreamBridge, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => ConnectorOffset}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Offset of the table stream = the last PROCESSED snapshot id (commit-log
  * position), exactly Delta's reservedVersion model: commits are the
  * stream's atomic units, so an offset needs one number and replaying any
  * `(start, end]` range is deterministic — snapshots are immutable.
  */
final case class GraftSourceOffset(snapshotId: Long) extends Offset {
  override def json: String = s"""{"snapshotId":$snapshotId}"""
}

object GraftSourceOffset {
  def apply(o: ConnectorOffset): GraftSourceOffset = o match {
    case g: GraftSourceOffset => g
    case s: SerializedOffset =>
      // {"snapshotId":N} — parse without a mapper dependency
      GraftSourceOffset(s.json.replaceAll("[^0-9-]", "").toLong)
    case other =>
      // any other rehydrated form still carries the json contract
      GraftSourceOffset(other.json.replaceAll("[^0-9-]", "").toLong)
  }
}

/** Streaming SOURCE over a [[SnapshotCatalog]] table: `spark.readStream
  * .format("graft-table")` tails the table's commit log, emitting each new
  * snapshot's appended rows as a micro-batch — the "table as a stream"
  * half of the streaming story ([[EventStreams.streamIntoCatalog]] being
  * the sink half), the same surface Delta/Iceberg expose for incremental
  * pipelines: land batches in table A, stream A → transform → table B,
  * compact/expire A behind the stream, never reprocessing old data.
  *
  * Options:
  *   - `warehouse`, `schema`, `table` (required): the source table.
  *   - `starting`: `earliest` (default — the whole table history, so the
  *     first batch backfills current contents) or `latest` (only commits
  *     after stream creation).
  *   - `startingSnapshotId`: explicit EXCLUSIVE lower bound (overrides
  *     `starting`).
  *   - `maxSnapshotsPerTrigger`: admission control — each micro-batch
  *     advances at most this many commits (default: all available).
  *   - `maxBytesPerTrigger`: admission control by DATA SIZE — a batch
  *     admits commits until their newly-added bytes (manifest entry
  *     sizes, zero extra I/O) would exceed this; at least one commit
  *     always admits (soft max, Delta semantics). Commits vary by
  *     orders of magnitude in bytes, so count pacing alone cannot
  *     bound a batch's input.
  *   - `skipChangeCommits`: `true` drops non-append commits (CoW/MoR DML,
  *     compaction) whole; default `false` FAILS the stream on them — the
  *     Delta source contract, never silently re-emitting rewritten rows.
  *   - `readChangeFeed`: `true` switches to CDC rows
  *     ([[SnapshotCatalog.readChanges]]) — the declared columns plus
  *     `_change_type` ("insert"/"delete") and `_commit_snapshot_id` —
  *     which represents every commit kind exactly.
  *
  * Scale posture: `getOffset` reads KB-scale commit-log JSON; `getBatch`
  * plans a scan of exactly the range's added (or touched, in CDC mode)
  * files via the manifest relation — no LIST calls, no full-table reads,
  * no shuffle for pure appends. Offsets are snapshot ids, so checkpoint
  * recovery replays a deterministic file set; `expireSnapshots` must keep
  * snapshots the slowest stream still needs (same retention contract as
  * Delta/Iceberg incremental consumers).
  */
final class GraftTableSource(spark: SparkSession,
                             parameters: Map[String, String])
    extends Source with SupportsTriggerAvailableNow with Logging {

  private val warehouse = parameters.getOrElse("warehouse",
    throw new IllegalArgumentException("graft-table source requires option 'warehouse'"))
  private val schemaName = parameters.getOrElse("schema",
    throw new IllegalArgumentException("graft-table source requires option 'schema'"))
  private val tableName = parameters.getOrElse("table",
    throw new IllegalArgumentException("graft-table source requires option 'table'"))
  private val cdc = parameters.get("readChangeFeed").exists(_.toBoolean)
  private val skipChangeCommits = parameters.get("skipChangeCommits").exists(_.toBoolean)
  private val maxSnapshotsPerTrigger = parameters.get("maxSnapshotsPerTrigger").map(_.toLong)
  require(maxSnapshotsPerTrigger.forall(_ > 0), "maxSnapshotsPerTrigger must be positive")
  private val maxBytesPerTrigger = parameters.get("maxBytesPerTrigger").map(_.toLong)
  require(maxBytesPerTrigger.forall(_ > 0), "maxBytesPerTrigger must be positive")

  private val catalog = new SnapshotCatalog(spark, warehouse)
  require(catalog.tableExists(schemaName, tableName),
    s"Table $schemaName.$tableName does not exist under $warehouse")

  /** Exclusive lower bound: snapshots at or below this id are never read.
    * Precedence: explicit snapshot id > timestamp > earliest/latest.
    */
  private val startingId: Long = parameters.get("startingSnapshotId").map(_.toLong)
    .orElse(parameters.get("startingTimestamp").map { raw =>
      // epoch millis or ISO-8601 instant; commits AT or AFTER it stream
      val ts = if (raw.forall(c => c.isDigit || c == '-')) raw.toLong
               else java.time.Instant.parse(raw).toEpochMilli
      catalog.snapshots(schemaName, tableName)
        .takeWhile(_.committedAtMillis < ts).lastOption.map(_.snapshotId).getOrElse(0L)
    })
    .getOrElse(parameters.getOrElse("starting", "earliest") match {
      case "earliest" => 0L
      case "latest" =>
        catalog.snapshots(schemaName, tableName).lastOption.map(_.snapshotId).getOrElse(0L)
      case other => throw new IllegalArgumentException(
        s"starting must be 'earliest' or 'latest', got '$other'")
    })

  /** Trigger.AvailableNow end target: fixed when the trigger starts so the
    * paced run drains exactly the data that existed then, and stops.
    */
  @volatile private var availableNowTarget: Option[Long] = None

  override val schema: StructType = GraftTableSource.schemaFor(spark, parameters)

  private def latestSnapshotId: Long =
    catalog.snapshots(schemaName, tableName).lastOption.map(_.snapshotId).getOrElse(0L)

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowTarget = Some(latestSnapshotId)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control (the engine prefers this over [[getOffset]]):
    * advance from `start` by at most `maxSnapshotsPerTrigger` commits
    * AND at most `maxBytesPerTrigger` of newly-added data bytes, never
    * past the Trigger.AvailableNow target. Commit ids are dense (+1 per
    * commit on a ref), so id arithmetic counts commits; commit bytes
    * come from the manifest-name diff
    * ([[SnapshotCatalog.addedBytes]] — manifest entry sizes are already
    * in metadata, zero extra I/O). The byte cap is soft in the Delta
    * sense: at least one commit always admits, so an oversized single
    * commit still makes progress instead of wedging the stream.
    */
  override def latestOffset(start: ConnectorOffset, limit: ReadLimit): ConnectorOffset = {
    val from = Option(start).map(GraftSourceOffset(_).snapshotId).getOrElse(startingId)
    val latest = availableNowTarget.fold(latestSnapshotId)(math.min(latestSnapshotId, _))
    val capped = maxSnapshotsPerTrigger.fold(latest)(m => math.min(latest, from + m))
    val byteCapped = maxBytesPerTrigger match {
      case None => capped
      case Some(maxB) =>
        val snaps = catalog.snapshots(schemaName, tableName)
        var prev = snaps.find(_.snapshotId == from)
        var admit = from
        var acc = 0L
        var stop = false
        snaps.iterator
          .filter(s => s.snapshotId > from && s.snapshotId <= capped)
          .foreach { s =>
            if (!stop) {
              val b = catalog.addedBytes(schemaName, tableName, s, prev)
              if (admit == from || acc + b <= maxB) {
                acc += b; admit = s.snapshotId; prev = Some(s)
              } else stop = true
            }
          }
        admit
    }
    GraftSourceOffset(math.max(from, byteCapped))
  }

  override def getOffset: Option[Offset] = {
    // legacy path (engines that don't consult SupportsAdmissionControl)
    val latest = latestSnapshotId
    if (latest <= startingId) None else Some(GraftSourceOffset(latest))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromId = start.map(GraftSourceOffset(_).snapshotId).getOrElse(startingId)
    val toId = GraftSourceOffset(end).snapshotId
    val batch: DataFrame =
      if (toId <= fromId)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else if (cdc) catalog.readChanges(schemaName, tableName, fromId, toId)
      else catalog.appendsBetween(schemaName, tableName, fromId, toId, skipChangeCommits)
    // conform to the stream's FIXED schema (pinned at query start) in
    // declared column order, then flag the plan as a streaming batch
    import org.apache.spark.sql.functions.{col, lit}
    val conformed = batch.select(schema.fields.toIndexedSeq.map { f =>
      if (batch.columns.exists(_.equalsIgnoreCase(f.name)))
        col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    logInfo(s"graft-table batch $schemaName.$tableName ($fromId, $toId]")
    GraftStreamBridge.asStreamingBatch(spark, conformed, schema)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftTableSource[$warehouse $schemaName.$tableName${if (cdc) " cdc" else ""}]"
}

object GraftTableSource {
  /** The stream's schema: the table's CURRENT declared schema, plus the
    * two CDC columns in `readChangeFeed` mode.
    */
  def schemaFor(spark: SparkSession, parameters: Map[String, String]): StructType = {
    val catalog = new SnapshotCatalog(spark,
      parameters.getOrElse("warehouse",
        throw new IllegalArgumentException("graft-table source requires option 'warehouse'")))
    val schemaName = parameters.getOrElse("schema",
      throw new IllegalArgumentException("graft-table source requires option 'schema'"))
    val tableName = parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-table source requires option 'table'"))
    val declared = catalog.declaredSchema(schemaName, tableName).getOrElse(
      throw new IllegalArgumentException(
        s"Table $schemaName.$tableName has no declared schema"))
    if (parameters.get("readChangeFeed").exists(_.toBoolean))
      declared.add("_change_type", StringType).add("_commit_snapshot_id", LongType)
    else declared
  }
}

/** `writeStream.format("graft-table")` sink: each micro-batch commits a
  * snapshot (append mode) or a keyed MERGE (`mode = upsert` with `key` +
  * `seqCol` options, collapsing each batch to its last row per key).
  * `txnAppId` turns on the exactly-once transactional identity — batch id
  * = txn version, so replays (lost checkpoint included) land nothing
  * twice ([[SnapshotCatalog.insert]]).
  */
final class GraftTableSink(spark: SparkSession,
                           parameters: Map[String, String]) extends Sink with Logging {
  private val warehouse = parameters.getOrElse("warehouse",
    throw new IllegalArgumentException("graft-table sink requires option 'warehouse'"))
  private val schemaName = parameters.getOrElse("schema",
    throw new IllegalArgumentException("graft-table sink requires option 'schema'"))
  private val tableName = parameters.getOrElse("table",
    throw new IllegalArgumentException("graft-table sink requires option 'table'"))
  private val txnAppId = parameters.get("txnAppId")
  private val upsert = parameters.get("mode") match {
    case None | Some("append") => false
    case Some("upsert")        => true
    case Some(other) => throw new IllegalArgumentException(
      s"graft-table sink mode must be 'append' or 'upsert', got '$other'")
  }
  private val catalog = new SnapshotCatalog(spark, warehouse)

  override def addBatch(batchId: Long, rawData: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): Unit = {
    // the engine hands a streaming-flagged DataFrame; batch writers
    // refuse it — re-plan as a batch over the same RDD (what foreachBatch
    // does for its callers)
    val data = org.apache.spark.sql.GraftStreamBridge.asBatch(spark, rawData.toDF())
    val txn = txnAppId.map(_ -> batchId)
    // an empty micro-batch commits nothing in EITHER mode — an idle
    // upsert stream must not grow the snapshot log / eq-delete chain
    if (data.isEmpty) return
    if (upsert) {
      val key = parameters.getOrElse("key",
        throw new IllegalArgumentException("graft-table upsert sink requires option 'key'"))
      val seqCol = parameters.getOrElse("seqCol",
        throw new IllegalArgumentException("graft-table upsert sink requires option 'seqCol'"))
      import org.apache.spark.sql.functions.{col, max_by, struct}
      val latest = data
        .groupBy(col(key))
        .agg(max_by(struct(data.columns.map(col).toIndexedSeq: _*), col(seqCol)).as("r"))
        .select(col("r.*"))
      // format_version = 2: equality-delete upsert — ONE append-shaped
      // commit (batch rows + a key file), the target is never read or
      // probed, so a small batch against a 100 TB table costs the batch.
      // v1 tables keep the CoW MERGE (probe + touched-file rewrite).
      if (catalog.formatVersion(schemaName, tableName) == 2)
        catalog.upsert(schemaName, tableName, latest, Seq(key), txn)
      else
        catalog.merge(schemaName, tableName, latest, key, txn)
    } else {
      catalog.insert(schemaName, tableName, data, txn)
    }
  }

  override def toString: String = s"GraftTableSink[$warehouse $schemaName.$tableName]"
}

/** `spark.readStream`/`writeStream.format("graft-table")` provider (V1
  * [[StreamSourceProvider]]/[[StreamSinkProvider]] — the
  * DataFrame-returning streaming API, the same one Spark's file sources
  * and Delta's DeltaSource/DeltaSink implement; V2 MicroBatchStream would
  * force a hand-rolled parquet PartitionReader where V1 reuses the
  * catalog's whole existing relation stack).
  */
final class GraftTableProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-table"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftTableSource.schemaFor(sqlContext.sparkSession, parameters))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new GraftTableSource(sqlContext.sparkSession, parameters)

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-table sink takes its partitioning from the TABLE's declared spec, " +
        "not partitionBy()")
    new GraftTableSink(sqlContext.sparkSession, parameters)
  }
}
