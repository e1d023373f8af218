package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Read-only interop with the Apache Iceberg TABLE FORMAT: parse a
  * genuine v1/v2 `metadata.json` + Avro manifest lists + Avro manifests
  * (iceberg.apache.org/spec/) into the engine's own model, so a table
  * written by the reference stack (Trino's Iceberg connector —
  * docker-compose.yml:57, TrinoConfigurationProvider.cs:42
  * `connector.name=iceberg`) can be queried, time-traveled, and
  * bounds-pruned here WITHOUT copying a byte of data.
  *
  * Everything here derives from the public Iceberg spec: the metadata
  * JSON shape (§Table Metadata), the manifest-list and manifest Avro
  * shapes (§Manifests, read by field NAME through the Avro java API —
  * the core avro jar ships with Spark), and the single-value binary
  * serialization for bounds (§Appendix D: little-endian ints/longs/
  * floats, UTF-8 strings, date = days int, timestamps = micros long).
  *
  * Deliberate read-only boundaries (each fails loud, never silently
  * misreads): row-level deletes import onto the engine's own
  * merge-on-read paths — positional deletes always, EQUALITY deletes
  * when their sequence-number scoping is exactly representable as an
  * engine `appliesTo` snapshot (verified per snapshot at import; a
  * compaction that carried data sequence numbers past a pending delete
  * refuses rather than risking a misread) — plus unsupported column
  * types (uuid/fixed), and a missing metadata file. Data files without
  * parquet field ids fall back to name resolution only after a footer
  * sample proves the names match the schema ([[parquetHasFieldIds]]).
  * Iceberg string bounds may be TRUNCATED (lower prefix-truncated down,
  * upper truncated-and-incremented) — conservative-but-valid inclusive
  * bounds, which is exactly the contract [[Manifests.mayMatch]] and
  * [[Manifests.mustMatch]] need (a widened range keeps proofs sound).
  */
object IcebergInterop {

  final case class IceSnapshot(id: Long, timestampMs: Long,
                               manifestList: String, operation: Option[String],
                               parentId: Option[Long],
                               seq: Option[Long] = None)

  /** `rawType` keeps the Iceberg type STRING for primitives whose Spark
    * mapping loses information — `uuid` maps to StringType (canonical
    * 36-char render, matching the reference's client-side GUID
    * handling) but its Appendix-D bounds are 16 big-endian bytes, not
    * UTF-8, so the bound decode must know.
    */
  final case class IceField(id: Int, name: String, dataType: DataType,
                            rawType: String = "")

  /** Spark's parquet field-id metadata key (SPARK-38094): a read schema
    * whose StructFields carry this resolves parquet columns by FIELD ID
    * instead of name when `spark.sql.parquet.fieldId.read.enabled` is
    * on — exactly how the Iceberg spec says data files must be read
    * (spec §Column Projection: "Values for field ids which are not
    * present in a data file must be resolved ... by id, not name"), so
    * a foreign `RENAME COLUMN` keeps reading the VALUES from pre-rename
    * files instead of silently NULLing them.
    */
  val FieldIdKey = "parquet.field.id"

  private def fieldIdMeta(id: Int): Metadata =
    new MetadataBuilder().putLong(FieldIdKey, id.toLong).build()

  /** `schema` with every `parquet.field.id` annotation removed (top
    * level and nested) — the name-resolution fallback for trees whose
    * data files carry no parquet field ids (`migrate`/`add_files`-built
    * tables), where id resolution would fail on every file.
    */
  def stripFieldIds(schema: StructType): StructType = {
    def strip(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = strip(f.dataType), metadata = stripMeta(f.metadata))))
      case a: ArrayType => a.copy(elementType = strip(a.elementType))
      case m: MapType =>
        m.copy(keyType = strip(m.keyType), valueType = strip(m.valueType))
      case other => other
    }
    def stripMeta(m: Metadata): Metadata =
      if (!m.contains(FieldIdKey)) m
      else {
        val b = new MetadataBuilder().withMetadata(m)
        b.remove(FieldIdKey)
        b.build()
      }
    strip(schema).asInstanceOf[StructType]
  }

  /** Whether a parquet file's footer schema annotates its (top-level)
    * columns with field ids — the register-time sample that decides
    * between id-faithful and name-based reads for an attached tree.
    */
  def parquetHasFieldIds(conf: Configuration, file: Path): Boolean = {
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, file,
      org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    footer.getFileMetaData.getSchema.getFields.asScala.forall(_.getId != null)
  }

  /** Top-level column names of a parquet file's footer schema. */
  def parquetFooterNames(conf: Configuration, file: Path): Seq[String] =
    parquetFooterFields(conf, file).map(_._1)

  /** Top-level (name, field id) pairs of a parquet footer schema — id
    * None where the writer stamped none. Column-presence checks match
    * by id on id-carrying files (a rename keeps the id) and by name on
    * id-less ones.
    */
  def parquetFooterFields(conf: Configuration,
                          file: Path): Seq[(String, Option[Int])] = {
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, file,
      org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    footer.getFileMetaData.getSchema.getFields.asScala
      .map(f => f.getName -> Option(f.getId).map(_.intValue)).toSeq
  }

  /** One default-spec partition field: the spec's field name (what the
    * manifest partition struct calls it), the transform string
    * ("identity", "bucket[16]", "month", …), and the source column's
    * field id.
    */
  final case class IceSpecField(name: String, transform: String, sourceId: Int)

  final case class IceMeta(formatVersion: Int, location: String,
                           schema: StructType, fields: Seq[IceField],
                           snapshots: Seq[IceSnapshot],
                           currentSnapshotId: Option[Long],
                           specFields: Seq[IceSpecField] = Nil,
                           tags: Map[String, Long] = Map.empty,
                           branches: Map[String, Long] = Map.empty)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The table's CURRENT metadata file: `metadata/version-hint.text`
    * (the HadoopCatalog convention) when present, else the
    * lexicographically largest `*.metadata.json` (both the `vN.` and the
    * `NNNNN-uuid.` naming schemes sort correctly within themselves).
    */
  def currentMetadataPath(fs: FileSystem, location: Path): Path = {
    val mdir = new Path(location, "metadata")
    val hint = new Path(mdir, "version-hint.text")
    if (fs.exists(hint)) {
      val in = fs.open(hint)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      new Path(mdir, s"v$v.metadata.json")
    } else {
      require(fs.exists(mdir), s"$location has no metadata directory")
      val cands = fs.listStatus(mdir).map(_.getPath.getName)
        .filter(_.endsWith(".metadata.json"))
      require(cands.nonEmpty, s"$mdir holds no *.metadata.json")
      // numeric-aware: plain String order puts v9 past v12 — parse the
      // leading version number of both naming schemes (`vN.` and
      // `NNNNN-uuid.`), name as the tiebreak
      val numRe = "^v?(\\d+)".r
      def num(n: String): Long =
        numRe.findFirstMatchIn(n).map(_.group(1).toLong).getOrElse(-1L)
      new Path(mdir, cands.maxBy(n => (num(n), n)))
    }
  }

  def parseMetadata(json: String): IceMeta = {
    val root = mapper.readTree(json)
    val fv = root.get("format-version").asInt
    require(fv == 1 || fv == 2,
      s"Unsupported Iceberg format-version $fv (v1/v2 only)")
    val location = root.get("location").asText
    // v2: schemas[] + current-schema-id; v1: a single `schema` (newer v1
    // writers also emit schemas[] — prefer the explicit current one)
    val schemaNode =
      if (root.hasNonNull("schemas") && root.hasNonNull("current-schema-id")) {
        val cur = root.get("current-schema-id").asInt
        root.get("schemas").elements.asScala
          .find(s => s.get("schema-id").asInt == cur)
          .getOrElse(throw new IllegalArgumentException(
            s"current-schema-id $cur not among schemas"))
      } else {
        require(root.hasNonNull("schema"), "metadata has no schema")
        root.get("schema")
      }
    val fields = schemaNode.get("fields").elements.asScala.map { f =>
      IceField(f.get("id").asInt, f.get("name").asText,
        parseType(f.get("type")),
        if (f.get("type").isTextual) f.get("type").asText else "")
    }.toSeq
    // field ids ride the schema as parquet.field.id metadata, so reads
    // resolve columns the way the spec requires (by id) when the data
    // files carry ids — see [[FieldIdKey]]
    val struct = StructType(fields.map(f =>
      StructField(f.name, f.dataType, nullable = true, fieldIdMeta(f.id))))
    val snaps = Option(root.get("snapshots")).toSeq
      .flatMap(_.elements.asScala).map { s =>
        require(s.hasNonNull("manifest-list"),
          "snapshot without manifest-list (pre-1.4 v1 inline `manifests` " +
            "layout is not supported)")
        IceSnapshot(
          s.get("snapshot-id").asLong,
          s.get("timestamp-ms").asLong,
          s.get("manifest-list").asText,
          Option(s.get("summary")).flatMap(n => Option(n.get("operation")))
            .map(_.asText),
          Option(s.get("parent-snapshot-id")).filterNot(_.isNull).map(_.asLong),
          // v2: the snapshot's sequence number (spec §Sequence Numbers) —
          // what scopes row-level deletes to the data files they shadow
          Option(s.get("sequence-number")).filterNot(_.isNull).map(_.asLong))
      }
    val current = Option(root.get("current-snapshot-id"))
      .map(_.asLong).filter(_ != -1L)
    // the DEFAULT partition spec (spec §Partition Specs): v2 requires
    // partition-specs[] + default-spec-id; older v1 metadata may carry
    // only the legacy inline `partition-spec` field list
    val specFields: Seq[IceSpecField] =
      if (root.hasNonNull("partition-specs")) {
        val wanted = Option(root.get("default-spec-id")).map(_.asInt).getOrElse(0)
        root.get("partition-specs").elements.asScala
          .find(s => s.get("spec-id").asInt == wanted)
          .toSeq.flatMap(_.get("fields").elements.asScala).map { f =>
            IceSpecField(f.get("name").asText, f.get("transform").asText,
              f.get("source-id").asInt)
          }.toSeq
      } else Option(root.get("partition-spec")).toSeq
        .flatMap(_.elements.asScala).map { f =>
          IceSpecField(f.get("name").asText, f.get("transform").asText,
            f.get("source-id").asInt)
        }
    // named refs (spec §Table Metadata `refs`): TAGS import as graft
    // tags when they pin a main-line snapshot; BRANCHES (other than
    // `main`, which IS the main line) mirror as graft branches — their
    // off-main ancestry converts onto per-ref commit logs
    val refEntries = Option(root.get("refs")).toSeq
      .flatMap(_.fields().asScala)
      .map(e => (e.getKey,
        Option(e.getValue.get("type")).map(_.asText).getOrElse("branch"),
        e.getValue.get("snapshot-id").asLong))
    val tags = refEntries.collect { case (n, "tag", sid) => n -> sid }.toMap
    val branches = refEntries.collect {
      case (n, "branch", sid) if n != "main" => n -> sid }.toMap
    IceMeta(fv, location, struct, fields, snaps, current, specFields, tags,
      branches)
  }

  /** The MAIN-LINE history: the parent chain walked back from the
    * current snapshot, returned root-first. The snapshots list may hold
    * MORE than the current state's ancestry — staged (WAP) snapshots,
    * and post-rollback survivors whose timestamps sort PAST the current
    * head — and importing those as if they were history would serve rows
    * the Iceberg table does not expose. Snapshots without parent ids
    * (old v1 writers) fall back to the (timestamp, id) order truncated
    * at the current snapshot.
    */
  def mainLine(meta: IceMeta): Seq[IceSnapshot] = {
    val byId = meta.snapshots.map(s => s.id -> s).toMap
    val cur = meta.currentSnapshotId.flatMap(byId.get).getOrElse(
      return meta.snapshots.sortBy(s => (s.timestampMs, s.id)))
    if (meta.snapshots.exists(s => s.parentId.isDefined && s.id != cur.id) ||
        cur.parentId.isDefined) {
      val chain = scala.collection.mutable.ArrayBuffer(cur)
      var p = cur.parentId
      while (p.isDefined) {
        val s = byId.getOrElse(p.get, // expired ancestor: chain starts here
          { p = None; null })
        if (s != null) { chain += s; p = s.parentId }
      }
      chain.reverse.toSeq
    } else {
      val ordered = meta.snapshots.sortBy(s => (s.timestampMs, s.id))
      ordered.takeWhile(s => s.id != cur.id) :+ cur
    }
  }

  /** A BRANCH ref's ancestry, root-first: the parent chain walked back
    * from `headId` until it leaves the snapshots list (expired
    * ancestor) or ends. The caller splits it at the main-line fork.
    */
  def branchChain(meta: IceMeta, headId: Long): Seq[IceSnapshot] = {
    val byId = meta.snapshots.map(s => s.id -> s).toMap
    val chain = scala.collection.mutable.ArrayBuffer.empty[IceSnapshot]
    var cur = byId.get(headId)
    // bounded by the snapshot count: corrupt metadata with a parent
    // CYCLE must fail loud, not hang the catalog
    while (cur.isDefined) {
      require(chain.size <= meta.snapshots.size,
        s"snapshot parent chain from $headId cycles — corrupt metadata")
      chain += cur.get
      cur = cur.get.parentId.flatMap(byId.get)
    }
    chain.reverse.toSeq
  }

  /** Iceberg JSON type → Spark DataType. Primitives per spec §Schemas;
    * struct/list/map recurse. `uuid` maps to StringType (the canonical
    * 36-char render — the reference stores GUIDs as varchar and parses
    * client-side, tests/02-tables.sql:49, AthenaClient.cs:98-101) and
    * `fixed[N]` to BinaryType; both attach faithfully when the data
    * files store those physical types (a real FLBA-uuid parquet file
    * fails loud at read, the module's boundary contract).
    */
  private[catalog] def parseType(node: com.fasterxml.jackson.databind.JsonNode): DataType =
    if (node.isTextual) {
      val t = node.asText
      val dec = "decimal\\((\\d+),\\s*(\\d+)\\)".r
      val fixed = "fixed\\[(\\d+)\\]".r
      t match {
        case "boolean"     => BooleanType
        case "int"         => IntegerType
        case "long"        => LongType
        case "float"       => FloatType
        case "double"      => DoubleType
        case "string"      => StringType
        case "date"        => DateType
        case "timestamp"   => TimestampNTZType
        case "timestamptz" => TimestampType
        case "binary"      => BinaryType
        case "uuid"        => StringType
        case fixed(_)      => BinaryType
        case dec(p, s)     => DecimalType(p.toInt, s.toInt)
        case other => throw new IllegalArgumentException(
          s"Unsupported Iceberg column type '$other'")
      }
    } else node.get("type").asText match {
      case "struct" =>
        StructType(node.get("fields").elements.asScala.map { f =>
          val m = Option(f.get("id")).filterNot(_.isNull)
            .map(id => fieldIdMeta(id.asInt)).getOrElse(Metadata.empty)
          StructField(f.get("name").asText, parseType(f.get("type")),
            nullable = true, m)
        }.toSeq)
      case "list" => ArrayType(parseType(node.get("element")))
      case "map"  => MapType(parseType(node.get("key")), parseType(node.get("value")))
      case other => throw new IllegalArgumentException(
        s"Unsupported Iceberg nested type '$other'")
    }

  private def openAvro(conf: Configuration, p: Path)
      : org.apache.avro.file.DataFileStream[org.apache.avro.generic.GenericRecord] = {
    val in = p.getFileSystem(conf).open(p)
    new org.apache.avro.file.DataFileStream(in,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
  }

  /** One manifest-list entry: path, content (0 = data manifests, 1 =
    * delete manifests — v2; absent in v1 → 0), and the manifest's
    * sequence number (v2; what ADDED entries with a null
    * data_sequence_number inherit, spec §Sequence Number Inheritance).
    */
  final case class IceManifest(path: String, content: Int, seq: Option[Long])

  def readManifestList(conf: Configuration, path: Path): Seq[IceManifest] = {
    val r = openAvro(conf, path)
    try r.iterator.asScala.map { rec =>
      IceManifest(rec.get("manifest_path").toString,
        Option(rec.get("content")).map(_.asInstanceOf[Int]).getOrElse(0),
        fieldOpt(rec, "sequence_number").map(_.asInstanceOf[Long]))
    }.toList
    finally r.close()
  }

  /** `rec.get(name)` that tolerates the field being ABSENT from the
    * file's writer schema (v1 manifests have no sequence columns).
    */
  private def fieldOpt(rec: org.apache.avro.generic.GenericRecord,
                       name: String): Option[Any] =
    if (rec.getSchema.getField(name) == null) None else Option(rec.get(name))

  /** One manifest's LIVE data files as engine entries: status 2
    * (DELETED) rows drop; a v2 delete file (data_file.content != 0)
    * fails the registration. Paths become absolute scheme-less URIs —
    * the representation adopted-in-place files already use.
    *
    * `specFields` (the table's default partition spec) folds each
    * entry's `partition` struct values into the bounds: an IDENTITY
    * transform value is an EXACT per-file bound (min = max = value,
    * nulls = 0 — every row in the file carries it), so partition
    * pruning, `mustMatch` totality proofs (partition-aligned metadata
    * DELETE), and the `$partitions` rollup work on attached tables the
    * way they do on native ones. Non-identity transforms carry no
    * row-value information the bounds tier could use — skipped.
    */
  def readManifest(conf: Configuration, path: Path,
                   fields: Seq[IceField],
                   specFields: Seq[IceSpecField] = Nil): Seq[DataFileEntry] =
    readManifestWithSeq(conf, path, fields, specFields, None).map(_._1)

  /** [[readManifest]] plus each entry's DATA SEQUENCE NUMBER (spec
    * §Sequence Numbers): the explicit `data_sequence_number` field when
    * present, else — for ADDED (status 1) entries, per the inheritance
    * rule — the carrying manifest's own sequence number
    * (`manifestSeq`). None when neither source knows (v1 manifests, or
    * an EXISTING entry written without the field — a shape the spec
    * forbids for v2). Only the equality-delete import consults it.
    */
  def readManifestWithSeq(conf: Configuration, path: Path,
                          fields: Seq[IceField],
                          specFields: Seq[IceSpecField] = Nil,
                          manifestSeq: Option[Long] = None)
      : Seq[(DataFileEntry, Option[Long])] = {
    val byId = fields.map(f => f.id -> f).toMap
    val identBySpecName: Map[String, IceField] =
      specFields.filter(_.transform == "identity")
        .flatMap(sf => byId.get(sf.sourceId).map(f => sf.name -> f)).toMap
    // TIME transforms (year/month/day/hour) and integral TRUNCATE fold
    // into CONSERVATIVE source-column range bounds — a month ordinal
    // proves every row's timestamp lies inside that month. They only
    // fill columns the manifest carries no real bounds for (real
    // writers' footer-derived bounds are tighter and win); bucket
    // transforms carry no row-value information (and Iceberg's murmur3
    // differs from any local hash) — skipped.
    val truncRe = "truncate\\[(\\d+)\\]".r
    val rangeBySpecName: Map[String, (IceField, String, Int)] =
      specFields.flatMap { sf =>
        val w = sf.transform match {
          case "year" | "month" | "day" | "hour" => Some(0)
          case truncRe(x) => Some(x.toInt)
          case _ => None
        }
        w.flatMap(ww => byId.get(sf.sourceId).map(f =>
          sf.name -> (f, sf.transform, ww)))
      }.toMap
    val r = openAvro(conf, path)
    try r.iterator.asScala.flatMap { rec =>
      val status = rec.get("status").asInstanceOf[Int]
      if (status == 2) None // DELETED entry: not part of this snapshot
      else {
        val df = rec.get("data_file").asInstanceOf[
          org.apache.avro.generic.GenericRecord]
        val content = Option(df.get("content"))
          .map(_.asInstanceOf[Int]).getOrElse(0)
        require(content == 0,
          s"$path holds a v2 delete file (content=$content) — read-only " +
            "Iceberg registration supports data files only")
        // loud at the BOUNDARY: an ORC/Avro-format tree (one config flip
        // on an Iceberg writer) must refuse at register with a typed
        // message, not stack-trace on parquet magic bytes mid-read
        val fmt = Option(df.get("file_format")).map(_.toString)
          .getOrElse("PARQUET")
        require(fmt.equalsIgnoreCase("PARQUET"),
          s"$path: data file ${df.get("file_path")} declares file_format " +
            s"$fmt — only PARQUET Iceberg trees can attach (ORC/Avro data " +
            "files have no graft read path); refusing at register")
        val rowsForPart = df.get("record_count").asInstanceOf[Long]
        val partRec: Option[org.apache.avro.generic.GenericRecord] =
          if (identBySpecName.isEmpty && rangeBySpecName.isEmpty) None
          else Option(df.get("partition")).collect {
            case pr: org.apache.avro.generic.GenericRecord => pr }
        val partBounds: Map[String, ColBounds] = partRec.map { pr =>
          pr.getSchema.getFields.asScala.flatMap { fld =>
            identBySpecName.get(fld.name()).flatMap { srcF =>
              decodePartitionValue(srcF.dataType, pr.get(fld.name()),
                  rowsForPart)
                .map(srcF.name -> _)
            }
          }.toMap
        }.getOrElse(Map.empty)
        // conservative RANGE bounds from time/truncate values — gap-fill
        // only (see rangeBySpecName); computed here, applied below after
        // the real bounds
        val rangeBounds: Map[String, ColBounds] = partRec.map { pr =>
          pr.getSchema.getFields.asScala.flatMap { fld =>
            rangeBySpecName.get(fld.name()).flatMap { case (srcF, tr, w) =>
              decodeTransformRange(srcF.dataType, tr, w, pr.get(fld.name()),
                rowsForPart).map(srcF.name -> _)
            }
          }.toMap
        }.getOrElse(Map.empty)
        // same scheme-normalization rule as SnapshotCatalog.SchemeNormRe:
        // absolute URIs classify identically with or without an authority
        val filePath = df.get("file_path").toString.replaceFirst(
          "^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")
        val rows = df.get("record_count").asInstanceOf[Long]
        val bytes = df.get("file_size_in_bytes").asInstanceOf[Long]
        val nulls = kvMap(df.get("null_value_counts"))
          .map { case (k, v) => k -> v.asInstanceOf[Long] }
        val lower = kvMap(df.get("lower_bounds"))
          .map { case (k, v) => k -> byteArray(v) }
        val upper = kvMap(df.get("upper_bounds"))
          .map { case (k, v) => k -> byteArray(v) }
        val bounds = byId.flatMap { case (id, f) =>
          val n = nulls.get(id)
          def dec(b: Option[Array[Byte]]) =
            if (f.rawType == "uuid") decodeUuidBound(b)
            else decodeBound(f.dataType, b)
          (dec(lower.get(id)), dec(upper.get(id))) match {
            case (Some((kind, mn)), Some((_, mx))) =>
              Some(f.name -> ColBounds(kind, mn, mx, n.getOrElse(-1L)))
            case _ if n.isDefined =>
              // null count alone still powers IS NULL / IS NOT NULL
              boundKind(f.dataType).map(k =>
                f.name -> ColBounds(k, null, null, n.get))
            case _ => None
          }
        }
        // precedence: transform RANGE bounds gap-fill, real recorded
        // bounds beat them (tighter), identity partition values are
        // EXACT and win over everything
        val dataSeq = fieldOpt(rec, "data_sequence_number")
          .map(_.asInstanceOf[Long])
          .orElse(if (status == 1) manifestSeq else None)
        Some((DataFileEntry(filePath, rows, bytes,
          rangeBounds ++ bounds ++ partBounds), dataSeq))
      }
    }.toList
    finally r.close()
  }

  /** One live delete file from a DELETE manifest (v2 row-level
    * deletes): `content` 1 = positional (rows addressed by
    * `(file_path, pos)`, spec §Position Delete Files) or 2 = equality
    * (key tuples over the `equalityIds` schema fields, spec §Equality
    * Delete Files); `dataSeq` is the delete's data sequence number —
    * an equality delete shadows data files whose own sequence number
    * is STRICTLY smaller (spec §Scan Planning).
    */
  final case class IceDeleteFile(path: String, content: Int, rows: Long,
                                 equalityIds: Seq[Int], dataSeq: Option[Long],
                                 bytes: Long = 0L)

  /** One DELETE manifest's live entries (v2 row-level deletes) —
    * positional AND equality delete files both surface (the caller
    * maps each onto the engine's own merge-on-read kind); status-2
    * (DELETED) entries drop like data manifests. `manifestSeq` feeds
    * the same sequence-number inheritance rule as
    * [[readManifestWithSeq]].
    */
  def readDeleteManifest(conf: Configuration, path: Path,
                         manifestSeq: Option[Long] = None): Seq[IceDeleteFile] = {
    val r = openAvro(conf, path)
    try r.iterator.asScala.flatMap { rec =>
      val status = rec.get("status").asInstanceOf[Int]
      if (status == 2) None
      else {
        val df = rec.get("data_file").asInstanceOf[
          org.apache.avro.generic.GenericRecord]
        val content = Option(df.get("content"))
          .map(_.asInstanceOf[Int]).getOrElse(0)
        require(content == 1 || content == 2,
          s"$path: delete manifest entry with content=$content (expected 1 " +
            "or 2)")
        val fmt = Option(df.get("file_format")).map(_.toString)
          .getOrElse("PARQUET")
        require(fmt.equalsIgnoreCase("PARQUET"),
          s"$path: delete file ${df.get("file_path")} declares file_format " +
            s"$fmt — only PARQUET Iceberg trees can attach; refusing at " +
            "register")
        val eqIds: Seq[Int] =
          if (content != 2) Nil
          else fieldOpt(df, "equality_ids").map {
            case c: java.util.Collection[_] =>
              c.asScala.map(_.asInstanceOf[Int]).toSeq
            case other => throw new IllegalArgumentException(
              s"$path: equality_ids is not a list: ${other.getClass}")
          }.getOrElse(throw new IllegalArgumentException(
            s"$path holds an equality delete file without equality_ids"))
        val dataSeq = fieldOpt(rec, "data_sequence_number")
          .map(_.asInstanceOf[Long])
          .orElse(if (status == 1) manifestSeq else None)
        Some(IceDeleteFile(df.get("file_path").toString, content,
          df.get("record_count").asInstanceOf[Long], eqIds, dataSeq,
          df.get("file_size_in_bytes").asInstanceOf[Long]))
      }
    }.toList
    finally r.close()
  }

  /** Iceberg serializes int-keyed maps as Avro arrays of {key, value}
    * records (Avro maps allow string keys only — spec §Avro).
    */
  private def kvMap(v: Any): Map[Int, Any] = v match {
    case null => Map.empty
    case c: java.util.Collection[_] =>
      c.asScala.map { e =>
        val rec = e.asInstanceOf[org.apache.avro.generic.GenericRecord]
        rec.get("key").asInstanceOf[Int] -> rec.get("value")
      }.toMap
    case m: java.util.Map[_, _] => // defensive: a string-keyed avro map
      m.asScala.map { case (k, vv) => k.toString.toInt -> vv }.toMap
    case _ => Map.empty
  }

  /** One identity-transform partition value (an Avro primitive from the
    * manifest `partition` struct) → an EXACT engine bound for the
    * source column: min = max = value, nulls = 0 (a non-null partition
    * value proves no row in the file is null in that column). A null
    * value becomes a nulls-only bound covering EVERY row — files of a
    * null partition hold only nulls in the source column, and the
    * column-projection fill ([[org.apache.spark.sql
    * .GraftManifestFileIndex]]) needs that marker to distinguish "all
    * null" from "value unknown" when the data files don't store the
    * column at all.
    */
  private[catalog] def decodePartitionValue(dt: DataType, v: Any,
                                            rows: Long = -1L): Option[ColBounds] = {
    if (v == null)
      return boundKind(dt).filter(_ => rows >= 0L)
        .map(k => ColBounds(k, null, null, rows))
    val kv: Option[(String, String)] = (dt, v) match {
      case (IntegerType | LongType, n: Number) => Some(("long", n.longValue.toString))
      case (DateType, n: Number)               => Some(("date", n.longValue.toString))
      case (TimestampType | TimestampNTZType, n: Number) =>
        Some(("ts", n.longValue.toString))
      case (FloatType | DoubleType, n: Number) =>
        val d = n.doubleValue
        if (d.isNaN) None else Some(("double", d.toString))
      case (StringType, s: CharSequence) =>
        // CharSequence only (plain String or avro Utf8): a fixed/uuid
        // byte value rendered via toString would fabricate a wrong
        // exact bound — no bound is the conservative miss
        val str = s.toString
        if (str.length <= Manifests.MaxStringBound) Some(("string", str)) else None
      case _ => None
    }
    kv.map { case (kind, s) => ColBounds(kind, s, s, 0L) }
  }

  /** One TIME-transform (year/month/day/hour ordinal, spec §Partition
    * Transforms) or integral-TRUNCATE partition value → a CONSERVATIVE
    * range bound on the SOURCE column: every row of the file provably
    * lies inside [lo, hi], and a non-null value proves zero nulls
    * (null source rows land in the null partition). A null value is
    * the all-null marker, like [[decodePartitionValue]]. String
    * truncate is skipped — the engine's string bounds have no tight
    * UTF-8 upper for a prefix.
    */
  private[catalog] def decodeTransformRange(dt: DataType, transform: String,
                                            w: Int, v: Any,
                                            rows: Long): Option[ColBounds] = {
    if (v == null)
      return boundKind(dt).filter(_ => rows >= 0L)
        .map(k => ColBounds(k, null, null, rows))
    val n = v match {
      case x: Number => x.longValue
      case _ => return None
    }
    import java.time.LocalDate
    // ordinal → [first, last] day-of-epoch of the covered span
    def dayRange: Option[(Long, Long)] = transform match {
      case "year" =>
        val y = 1970 + n.toInt
        Some((LocalDate.of(y, 1, 1).toEpochDay,
          LocalDate.of(y + 1, 1, 1).toEpochDay - 1))
      case "month" =>
        val y = 1970 + java.lang.Math.floorDiv(n, 12L).toInt
        val m = java.lang.Math.floorMod(n, 12L).toInt + 1
        val first = LocalDate.of(y, m, 1)
        Some((first.toEpochDay, first.plusMonths(1).toEpochDay - 1))
      case "day" => Some((n, n))
      case _ => None
    }
    try (dt, transform) match {
      case (DateType, "year" | "month" | "day") =>
        dayRange.map { case (lo, hi) =>
          ColBounds("date", lo.toString, hi.toString, 0L) }
      case (TimestampType | TimestampNTZType, "year" | "month" | "day") =>
        // foreign ordinals are UNTRUSTED: a huge value would overflow
        // the micros multiplication silently and fabricate wrong
        // bounds — out-of-range days drop the bound (conservative)
        dayRange.filter { case (lo, hi) =>
          math.abs(lo) < 106751990L && math.abs(hi) < 106751990L }
          .map { case (lo, hi) =>
            ColBounds("ts", (lo * 86400000000L).toString,
              ((hi + 1) * 86400000000L - 1).toString, 0L) }
      case (TimestampType | TimestampNTZType, "hour")
          if math.abs(n) < 2562047787L =>
        Some(ColBounds("ts", (n * 3600000000L).toString,
          ((n + 1) * 3600000000L - 1).toString, 0L))
      case (IntegerType | LongType, t) if t.startsWith("truncate") &&
          w > 0 && n <= Long.MaxValue - w =>
        Some(ColBounds("long", n.toString, (n + w - 1).toString, 0L))
      case _ => None
    } catch { case _: java.time.DateTimeException => None }
  }

  private def byteArray(v: Any): Array[Byte] = v match {
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case a: Array[Byte] => a
    case other => throw new IllegalArgumentException(
      s"bound value is not bytes: ${other.getClass}")
  }

  /** The engine bound kind a column type maps to, or None for types the
    * bounds tier does not reason about.
    */
  private def boundKind(dt: DataType): Option[String] = dt match {
    case IntegerType | LongType            => Some("long")
    case DateType                          => Some("date")
    case TimestampType | TimestampNTZType  => Some("ts")
    case FloatType | DoubleType            => Some("double")
    case StringType                        => Some("string")
    case _                                 => None
  }

  /** Single-value binary serialization (spec Appendix D) → the engine's
    * stringified bound representation. Anything undecodable drops the
    * bound (conservative: the file is kept by mayMatch, unprovable by
    * mustMatch).
    */
  private[catalog] def decodeBound(dt: DataType,
                                   bytes: Option[Array[Byte]]): Option[(String, String)] = {
    val b = bytes.getOrElse(return None)
    def le = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    dt match {
      case IntegerType if b.length == 4 => Some(("long", le.getInt.toString))
      case LongType if b.length == 8    => Some(("long", le.getLong.toString))
      case DateType if b.length == 4    => Some(("date", le.getInt.toLong.toString))
      case (TimestampType | TimestampNTZType) if b.length == 8 =>
        Some(("ts", le.getLong.toString))
      case FloatType if b.length == 4 =>
        val f = le.getFloat
        if (f.isNaN) None else Some(("double", f.toDouble.toString))
      case DoubleType if b.length == 8 =>
        val d = le.getDouble
        if (d.isNaN) None else Some(("double", d.toString))
      case StringType =>
        val s = new String(b, "UTF-8")
        if (s.length <= Manifests.MaxStringBound) Some(("string", s)) else None
      case _ => None
    }
  }

  /** Appendix-D `uuid` single-value bytes (16 big-endian) → the
    * canonical lowercase 36-char render as a STRING bound. Canonical
    * hex is order-preserving over the byte order ('0'-'9' < 'a'-'f' in
    * UTF-8, dashes at fixed positions), so min/max renders are valid
    * string bounds for the StringType-mapped column.
    */
  private[catalog] def decodeUuidBound(
      bytes: Option[Array[Byte]]): Option[(String, String)] = {
    val b = bytes.getOrElse(return None)
    if (b.length != 16) return None
    val bb = java.nio.ByteBuffer.wrap(b) // big-endian by default
    Some(("string", new java.util.UUID(bb.getLong, bb.getLong).toString))
  }
}
