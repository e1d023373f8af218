package graft.catalog

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.jdk.CollectionConverters._

/** Minimal SPEC-CONFORMANT Apache Iceberg tree writer — the fixture side
  * of [[IcebergInterop]], used by the interop spec and the registry
  * demo. Writes genuine Avro manifest lists + manifests (the field
  * names, k/v-array map encoding, and binary single-value bounds of
  * iceberg.apache.org/spec/#manifests) and a handcrafted v1/v2
  * `metadata.json`, so the READER is exercised against the real on-disk
  * shapes rather than its own output. Deliberately independent of the
  * reader: bounds are encoded with raw ByteBuffers here and decoded by
  * [[IcebergInterop.decodeBound]] there.
  */
object IcebergFixture {

  /** One data file to track: absolute path, rows, bytes, per-column
    * (fieldId → (lowerBytes, upperBytes, nullCount)), and the
    * manifest `partition` struct values (spec field name → Avro
    * primitive) for partitioned trees. `eqIds` marks an EQUALITY
    * delete file's key field ids (content 2); `dataSeq` writes an
    * EXPLICIT `data_sequence_number` on the manifest entry (spec
    * §Sequence Number Inheritance — a null entry with ADDED status
    * inherits the manifest list's sequence number instead); `status`
    * is the manifest-entry status (1 = ADDED, 0 = EXISTING).
    */
  final case class FileRef(path: String, rows: Long, bytes: Long,
                           stats: Map[Int, (Array[Byte], Array[Byte], Long)],
                           partition: Seq[(String, Any)] = Nil,
                           eqIds: Seq[Int] = Nil,
                           dataSeq: Option[Long] = None,
                           status: Int = 1,
                           addedSnapId: Option[Long] = None,
                           format: String = "PARQUET")

  /** `deletes` = POSITIONAL delete files (content 1) and `eqDeletes` =
    * EQUALITY delete files (content 2) the snapshot carries in a
    * second, delete-content manifest. `seq` = the snapshot's v2
    * sequence number (defaults to its 1-based position in the tree).
    */
  final case class SnapRef(id: Long, timestampMs: Long, files: Seq[FileRef],
                           deletes: Seq[FileRef] = Nil,
                           eqDeletes: Seq[FileRef] = Nil,
                           seq: Option[Long] = None,
                           parentId: Option[Long] = None)

  /** Stamp parquet field ids (column name → id) onto `df` so files it
    * writes carry footer ids like every real Iceberg writer's — Spark
    * writes them from this metadata (`spark.sql.parquet.fieldId.write
    * .enabled`, on by default).
    */
  def withFieldIds(df: org.apache.spark.sql.DataFrame,
                   ids: Map[String, Int]): org.apache.spark.sql.DataFrame =
    df.select(df.columns.toIndexedSeq.map { c =>
      ids.get(c) match {
        case Some(id) => org.apache.spark.sql.functions.col(c).as(c,
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong(IcebergInterop.FieldIdKey, id.toLong).build())
        case None => org.apache.spark.sql.functions.col(c)
      }
    }: _*)

  /** Write `df` as ONE parquet file at exactly `target`; returns bytes. */
  def writeOneParquet(conf: Configuration, df: org.apache.spark.sql.DataFrame,
                      target: Path): Long = {
    val fs = target.getFileSystem(conf)
    val tmp = new Path(target.getParent,
      s".stage-${java.util.UUID.randomUUID().toString.take(8)}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(target.getParent)
    if (fs.exists(target)) fs.delete(target, false)
    fs.rename(part, target)
    fs.delete(tmp, true)
    fs.getFileStatus(target).getLen
  }

  def encodeLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  def encodeInt(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  def encodeDouble(v: Double): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v).array()

  def encodeString(v: String): Array[Byte] = v.getBytes("UTF-8")

  private val kvLongSchema = new Schema.Parser().parse(
    """{"type":"array","items":{"type":"record","name":"k117_v118","fields":[
      |{"name":"key","type":"int","field-id":117},
      |{"name":"value","type":"long","field-id":118}]}}""".stripMargin)

  private val kvBytesSchema = new Schema.Parser().parse(
    """{"type":"array","items":{"type":"record","name":"k126_v127","fields":[
      |{"name":"key","type":"int","field-id":126},
      |{"name":"value","type":"bytes","field-id":127}]}}""".stripMargin)

  /** The manifest_entry Avro schema (spec §Manifests), data-file fields
    * the reader consumes plus the required structural ones. `content`
    * makes it the v2 shape; v1 readers ignore unknown fields by name.
    * The `partition` struct is built per tree from the partition-spec
    * fields (name → Avro primitive type), empty for unpartitioned.
    */
  private def entrySchemaFor(partFields: Seq[(String, String)]): Schema = {
    val pf = partFields.map { case (n, t) =>
      s"""{"name":"$n","type":["null","$t"],"default":null}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"data_sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
         |  {"name":"content","type":"int","field-id":134},
         |  {"name":"file_path","type":"string","field-id":100},
         |  {"name":"file_format","type":"string","field-id":101},
         |  {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$pf]}},
         |  {"name":"record_count","type":"long","field-id":103},
         |  {"name":"file_size_in_bytes","type":"long","field-id":104},
         |  {"name":"null_value_counts","type":["null",${kvLongSchema}],"default":null,"field-id":110},
         |  {"name":"lower_bounds","type":["null",${kvBytesSchema}],"default":null,"field-id":125},
         |  {"name":"upper_bounds","type":["null",${kvBytesSchema}],"default":null,"field-id":128},
         |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135}
         |]}}]}""".stripMargin)
  }

  private val manifestEntrySchema = entrySchemaFor(Nil)

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503}
      |]}""".stripMargin)

  private def writeAvro(conf: Configuration, path: Path, schema: Schema,
                        records: Seq[GenericRecord]): Long = {
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, true)
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    records.foreach(w.append)
    w.close()
    fs.getFileStatus(path).getLen
  }

  private def kvLong(m: Map[Int, Long]): GenericData.Array[GenericRecord] = {
    val arr = new GenericData.Array[GenericRecord](m.size, kvLongSchema)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      arr.add(new GenericRecordBuilder(kvLongSchema.getElementType)
        .set("key", k).set("value", v).build())
    }
    arr
  }

  private def kvBytes(m: Map[Int, Array[Byte]]): GenericData.Array[GenericRecord] = {
    val arr = new GenericData.Array[GenericRecord](m.size, kvBytesSchema)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      arr.add(new GenericRecordBuilder(kvBytesSchema.getElementType)
        .set("key", k).set("value", java.nio.ByteBuffer.wrap(v)).build())
    }
    arr
  }

  /** Write one manifest for `files` (all status 1 = ADDED) and return
    * (path, length). `content` goes on each data_file record: 0 = data,
    * 1 = positional deletes, 2 = equality deletes.
    */
  def writeManifest(conf: Configuration, metadataDir: Path, snapId: Long,
                    files: Seq[FileRef], content: Int = 0,
                    partFields: Seq[(String, String)] = Nil): (Path, Long) = {
    val p = new Path(metadataDir,
      s"m$content-$snapId-${files.hashCode & 0x7fffffff}.avro")
    val entrySchema =
      if (partFields.isEmpty) manifestEntrySchema else entrySchemaFor(partFields)
    val dfSchema = entrySchema.getField("data_file").schema
    val recs = files.map { fr =>
      val partSchema = dfSchema.getField("partition").schema
      val partBuilder = new GenericRecordBuilder(partSchema)
      fr.partition.foreach { case (n, v) => partBuilder.set(n, v) }
      val dfb = new GenericRecordBuilder(dfSchema)
        .set("content", content)
        .set("file_path", fr.path)
        .set("file_format", fr.format)
        .set("partition", partBuilder.build())
        .set("record_count", fr.rows)
        .set("file_size_in_bytes", fr.bytes)
        .set("null_value_counts", kvLong(fr.stats.map { case (k, s) => k -> s._3 }))
        .set("lower_bounds", kvBytes(fr.stats.map { case (k, s) => k -> s._1 }))
        .set("upper_bounds", kvBytes(fr.stats.map { case (k, s) => k -> s._2 }))
      if (fr.eqIds.nonEmpty)
        dfb.set("equality_ids", fr.eqIds.map(Int.box).asJava)
      val eb = new GenericRecordBuilder(entrySchema)
        .set("status", fr.status)
        .set("snapshot_id", fr.addedSnapId.getOrElse(snapId))
        .set("data_file", dfb.build())
      fr.dataSeq.foreach(s => eb.set("data_sequence_number", s))
      eb.build(): GenericRecord
    }
    (p, writeAvro(conf, p, entrySchema, recs))
  }

  /** Write the manifest list for one snapshot; `content` 0 = data (pass
    * 1 to fabricate a delete-manifest entry).
    */
  def writeManifestList(conf: Configuration, metadataDir: Path, snapId: Long,
                        manifests: Seq[(Path, Long)], content: Int = 0): Path =
    writeManifestListEntries(conf, metadataDir, snapId,
      manifests.map { case (p, len) => (p, len, content) })

  /** Mixed-content manifest list: one (path, length, content) entry per
    * manifest — content 0 = data manifests, 1 = delete manifests.
    */
  def writeManifestListEntries(conf: Configuration, metadataDir: Path,
                               snapId: Long,
                               manifests: Seq[(Path, Long, Int)]): Path =
    writeManifestListSeq(conf, metadataDir, snapId,
      manifests.map { case (p, len, c) => (p, len, c, 1L) })

  /** [[writeManifestListEntries]] with an explicit per-manifest
    * sequence number — what null-seq ADDED entries inherit (spec
    * §Sequence Number Inheritance); delete-carrying trees need real
    * values here.
    */
  def writeManifestListSeq(conf: Configuration, metadataDir: Path,
                           snapId: Long,
                           manifests: Seq[(Path, Long, Int, Long)]): Path =
    writeManifestListFull(conf, metadataDir, snapId,
      manifests.map { case (p, len, c, seq) => (p, len, c, seq, 0) })

  /** [[writeManifestListSeq]] with an explicit per-manifest
    * partition-spec id — delete manifests of a partitioned tree
    * reference the unpartitioned spec (global deletes) while data
    * manifests reference the identity spec.
    */
  def writeManifestListFull(conf: Configuration, metadataDir: Path,
                            snapId: Long,
                            manifests: Seq[(Path, Long, Int, Long, Int)]): Path = {
    val p = new Path(metadataDir, s"snap-$snapId.avro")
    val recs = manifests.map { case (mp, len, content, seq, specId) =>
      new GenericRecordBuilder(manifestListSchema)
        .set("manifest_path", mp.toUri.toString)
        .set("manifest_length", len)
        .set("partition_spec_id", specId)
        .set("content", content)
        .set("sequence_number", seq)
        .set("min_sequence_number", seq)
        .set("added_snapshot_id", snapId)
        .build(): GenericRecord
    }
    writeAvro(conf, p, manifestListSchema, recs)
    p
  }

  /** Handcraft the metadata JSON. `fields` = (id, name, icebergType). */
  def metadataJson(formatVersion: Int, location: String,
                   fields: Seq[(Int, String, String)],
                   snapshots: Seq[(SnapRef, Path)],
                   currentSnapshotId: Long,
                   properties: Map[String, String] = Map.empty,
                   specFields: Seq[(String, String, Int)] = Nil,
                   tagRefs: Map[String, Long] = Map.empty,
                   branchRefs: Map[String, Long] = Map.empty,
                   tableUuid: Option[String] = None): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("format-version", formatVersion)
    root.put("table-uuid",
      tableUuid.getOrElse(java.util.UUID.randomUUID().toString))
    root.put("location", location)
    if (formatVersion == 2) root.put("last-sequence-number",
      snapshots.zipWithIndex.map { case ((s, _), i) =>
        s.seq.getOrElse(i + 1L) }.maxOption.getOrElse(0L))
    root.put("last-updated-ms",
      snapshots.map(_._1.timestampMs).maxOption.getOrElse(0L))
    // a field's type may be a JSON OBJECT (struct/list/map with nested
    // field ids); last-column-id must cover the nested ids too
    def maxId(n: com.fasterxml.jackson.databind.JsonNode): Int =
      if (n == null) 0
      else if (n.isObject || n.isArray) {
        val own = Seq("id", "element-id", "key-id", "value-id")
          .flatMap(k => Option(n.get(k)).filter(_.isInt).map(_.asInt))
        (own ++ n.elements.asScala.map(maxId)).maxOption.getOrElse(0)
      } else 0
    val typeNodes = fields.map { case (_, _, t) =>
      if (t.startsWith("{")) Some(m.readTree(t)) else None
    }
    root.put("last-column-id",
      (fields.map(_._1) ++ typeNodes.flatten.map(maxId))
        .maxOption.getOrElse(0))
    def schemaNode(n: com.fasterxml.jackson.databind.node.ObjectNode): Unit = {
      n.put("type", "struct")
      n.put("schema-id", 0)
      val fs = n.putArray("fields")
      fields.zip(typeNodes).foreach { case ((id, name, t), tn) =>
        val f = fs.addObject()
        f.put("id", id); f.put("name", name); f.put("required", false)
        tn match {
          case Some(node) =>
            f.set[com.fasterxml.jackson.databind.JsonNode]("type", node)
          case None => f.put("type", t)
        }
      }
    }
    if (formatVersion == 2) {
      root.put("current-schema-id", 0)
      schemaNode(root.putArray("schemas").addObject())
    } else schemaNode(root.putObject("schema"))
    root.put("default-spec-id", 0)
    val specsArr = root.putArray("partition-specs")
    val specs = specsArr.addObject()
    specs.put("spec-id", 0)
    val sfArr = specs.putArray("fields")
    specFields.zipWithIndex.foreach { case ((n, tr, srcId), i) =>
      val f = sfArr.addObject()
      f.put("name", n); f.put("transform", tr)
      f.put("source-id", srcId); f.put("field-id", 1000 + i)
    }
    // partitioned trees also declare an UNPARTITIONED spec (id 1) for
    // delete manifests: exported row-level deletes are global, and a
    // delete manifest claiming the identity spec with an empty
    // partition struct would be malformed for strict readers
    if (specFields.nonEmpty) {
      val s1 = specsArr.addObject()
      s1.put("spec-id", 1); s1.putArray("fields")
    }
    // the highest ASSIGNED partition field id (spec §Table Metadata):
    // a writer evolving the spec mints lastAssignedPartitionId+1, so an
    // understated value would make it reuse field-id 1000
    root.put("last-partition-id",
      if (specFields.isEmpty) 999 else 999 + specFields.size)
    root.put("default-sort-order-id", 0)
    val so = root.putArray("sort-orders").addObject()
    so.put("order-id", 0); so.putArray("fields")
    val propsNode = root.putObject("properties")
    properties.toSeq.sortBy(_._1).foreach { case (k, v) => propsNode.put(k, v) }
    root.put("current-snapshot-id", currentSnapshotId)
    if (tagRefs.nonEmpty || snapshots.nonEmpty) {
      val refs = root.putObject("refs")
      val mainRef = refs.putObject("main")
      mainRef.put("snapshot-id", currentSnapshotId)
      mainRef.put("type", "branch")
      tagRefs.toSeq.sortBy(_._1).foreach { case (name, sid) =>
        val r = refs.putObject(name)
        r.put("snapshot-id", sid); r.put("type", "tag")
      }
      branchRefs.toSeq.sortBy(_._1).foreach { case (name, sid) =>
        val r = refs.putObject(name)
        r.put("snapshot-id", sid); r.put("type", "branch")
      }
    }
    val sn = root.putArray("snapshots")
    // linear-parent fallback applies ONLY to pure legacy trees: once
    // ANY snapshot carries an explicit parent, a None parent means a
    // genuine ROOT (a root-grown branch must not get spliced onto the
    // list predecessor's ancestry)
    val anyExplicitParent = snapshots.exists(_._1.parentId.isDefined)
    snapshots.zipWithIndex.foreach { case ((s, mlPath), i) =>
      val o = sn.addObject()
      o.put("snapshot-id", s.id)
      s.parentId match {
        case Some(p) => o.put("parent-snapshot-id", p)
        case None if i > 0 && !anyExplicitParent =>
          o.put("parent-snapshot-id", snapshots(i - 1)._1.id)
        case None => ()
      }
      o.put("timestamp-ms", s.timestampMs)
      if (formatVersion == 2)
        o.put("sequence-number", s.seq.getOrElse(i + 1L))
      o.putObject("summary").put("operation", "append")
      o.put("manifest-list", mlPath.toUri.toString)
      o.put("schema-id", 0)
    }
    // snapshot-log records the MAIN history only (spec §Table Metadata:
    // "the current snapshot's" lineage) — branch-ancestry snapshots in
    // the list stay out of it
    val byId = snapshots.map(s => s._1.id -> s._1).toMap
    val mainChain = {
      val b = scala.collection.mutable.ArrayBuffer.empty[SnapRef]
      var cur = byId.get(currentSnapshotId)
      var hops = 0
      while (cur.isDefined && hops <= snapshots.size) {
        b += cur.get
        cur = cur.get.parentId.flatMap(byId.get)
          .orElse {
            // linear-default trees carry no explicit parents: fall back
            // to the list predecessor (never for mixed trees, where a
            // None parent means a genuine root)
            if (cur.get.parentId.isEmpty &&
                !snapshots.exists(_._1.parentId.isDefined)) {
              val i = snapshots.indexWhere(_._1.id == b.last.id)
              if (i > 0) Some(snapshots(i - 1)._1) else None
            } else None
          }
        hops += 1
      }
      b.reverse.map(_.id).toSet
    }
    val log = root.putArray("snapshot-log")
    snapshots.filter(s => mainChain(s._1.id)).foreach { case (s, _) =>
      val o = log.addObject()
      o.put("timestamp-ms", s.timestampMs); o.put("snapshot-id", s.id)
    }
    root.putArray("metadata-log")
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Write a complete little Iceberg tree: per-snapshot manifest +
    * manifest list, then `metadata/v1.metadata.json` + version-hint.
    * Snapshots are CUMULATIVE (each lists all its files, like a real
    * writer's manifest carry). Returns the metadata file path.
    */
  def writeTree(conf: Configuration, location: Path, formatVersion: Int,
                fields: Seq[(Int, String, String)],
                snapshots: Seq[SnapRef],
                specFields: Seq[(String, String, Int)] = Nil,
                partAvroTypes: Seq[(String, String)] = Nil,
                tagRefs: Map[String, Long] = Map.empty,
                branchRefs: Map[String, Long] = Map.empty): Path =
    writeTreeWithCurrent(conf, location, fields, snapshots,
      snapshots.last.id, formatVersion, specFields = specFields,
      partAvroTypes = partAvroTypes, tagRefs = tagRefs,
      branchRefs = branchRefs)

  /** [[writeTree]] with an explicit current-snapshot-id — fabricates the
    * staged-snapshot (WAP) / rollback shapes where the list holds
    * snapshots PAST the current head.
    */
  def writeTreeWithCurrent(conf: Configuration, location: Path,
                           fields: Seq[(Int, String, String)],
                           snapshots: Seq[SnapRef], currentId: Long,
                           formatVersion: Int = 2,
                           properties: Map[String, String] = Map.empty,
                           specFields: Seq[(String, String, Int)] = Nil,
                           partAvroTypes: Seq[(String, String)] = Nil,
                           tagRefs: Map[String, Long] = Map.empty,
                           branchRefs: Map[String, Long] = Map.empty): Path =
    writeTreeAppend(conf, location, fields, Nil, snapshots, currentId,
      version = 1, formatVersion = formatVersion, properties = properties,
      specFields = specFields, partAvroTypes = partAvroTypes,
      tagRefs = tagRefs, branchRefs = branchRefs)

  /** [[writeTreeWithCurrent]] that APPENDS to an existing exported
    * tree: manifests + manifest lists are written for `newSnapshots`
    * only; `existing` snapshots ride into the new metadata with their
    * already-on-disk manifest-list paths untouched. Writes
    * `v<version>.metadata.json` and bumps the version hint — the
    * HadoopCatalog commit convention, so a foreign reader polling the
    * tree sees the new snapshots as an ordinary metadata advance
    * (same `table-uuid` when passed).
    */
  def writeTreeAppend(conf: Configuration, location: Path,
                      fields: Seq[(Int, String, String)],
                      existing: Seq[(SnapRef, Path)],
                      newSnapshots: Seq[SnapRef], currentId: Long,
                      version: Int,
                      formatVersion: Int = 2,
                      properties: Map[String, String] = Map.empty,
                      specFields: Seq[(String, String, Int)] = Nil,
                      partAvroTypes: Seq[(String, String)] = Nil,
                      tagRefs: Map[String, Long] = Map.empty,
                      branchRefs: Map[String, Long] = Map.empty,
                      tableUuid: Option[String] = None): Path = {
    val mdir = new Path(location, "metadata")
    val delSpecId = if (specFields.nonEmpty) 1 else 0
    val withLists = existing ++ newSnapshots.zipWithIndex.map { case (s, i) =>
      val seq = s.seq.getOrElse(existing.size + i + 1L)
      val (mp, mlen) = writeManifest(conf, mdir, s.id, s.files,
        partFields = partAvroTypes)
      val mans = Seq((mp, mlen, 0, seq, 0)) ++
        (if (s.deletes.isEmpty) Nil else {
          val (dp, dlen) = writeManifest(conf, mdir, s.id, s.deletes,
            content = 1)
          Seq((dp, dlen, 1, seq, delSpecId))
        }) ++
        (if (s.eqDeletes.isEmpty) Nil else {
          val (ep, elen) = writeManifest(conf, mdir, s.id, s.eqDeletes,
            content = 2)
          Seq((ep, elen, 1, seq, delSpecId))
        })
      (s, writeManifestListFull(conf, mdir, s.id, mans))
    }
    val json = metadataJson(formatVersion, location.toUri.toString, fields,
      withLists, currentId, properties, specFields, tagRefs, branchRefs,
      tableUuid)
    val mp = new Path(mdir, s"v$version.metadata.json")
    val fs = mp.getFileSystem(conf)
    val out = fs.create(mp, true)
    out.write(json.getBytes("UTF-8")); out.close()
    val hint = fs.create(new Path(mdir, "version-hint.text"), true)
    hint.write(version.toString.getBytes("UTF-8")); hint.close()
    mp
  }
}
