package org.apache.spark.sql

import graft.catalog.{DataFileEntry, Manifests}

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, Cast, Expression, GenericInternalRow, Literal, Predicate}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Manifest-driven scan planning: a [[FileIndex]] whose file list comes
  * from the snapshot's manifest entries instead of a storage listing, and
  * whose `listFiles` prunes that list with the pushed-down predicates —
  * partition filters against the hive `col=value` path segments, data
  * filters against each entry's per-column min/max bounds
  * ([[Manifests.mayMatch]], Iceberg's inclusive-projection scan planning:
  * iceberg.apache.org/spec/#scan-planning).
  *
  * This is what turns the manifest tier into a 100 TB read path: planning
  * a filtered SELECT costs zero object-store LIST calls (file names,
  * sizes and bounds all come from manifest JSON) and opens zero parquet
  * footers for provably-unmatched files. Row-group pruning inside the
  * surviving files still happens in the parquet reader as usual — bounds
  * only shrink the file list, never decide rows, so a conservative miss
  * costs IO, not correctness.
  *
  * Lives in `org.apache.spark.sql` because constructing a
  * [[HadoopFsRelation]]/[[LogicalRelation]] directly (the V1 file-source
  * relation `spark.read.parquet` itself builds) needs the classic-session
  * internals — the same extension-point pattern as [[GraftSqlBridge]].
  */
object GraftScanBridge {

  /** Data files of one manifest snapshot as a relation. `dataSchema` =
    * columns physically present in the parquet files; `partitionCols` =
    * (name, type) of hive path columns in path-segment order (identity
    * partition columns with their declared types; `_snap` and derived
    * transform columns as strings). Output column order is
    * `dataSchema ++ partitionCols`, like any file-source relation —
    * callers reorder/drop to the declared surface.
    */
  def manifestScan(spark: SparkSession, tableRoot: Path,
                   entries: Seq[DataFileEntry],
                   dataSchema: StructType,
                   partitionCols: Seq[(String, DataType)],
                   transformProjection: Seq[Expression] => DataFileEntry => Boolean =
                     _ => _ => true): DataFrame = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val partitionSchema = StructType(partitionCols.map {
      case (n, dt) => StructField(n, dt, nullable = true)
    })
    val index = new GraftManifestFileIndex(
      classicSpark.sessionState.newHadoopConf(), tableRoot, entries, partitionSchema,
      transformProjection)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    classic.Dataset.ofRows(classicSpark, LogicalRelation(relation, isStreaming = false))
  }
}

object GraftManifestFileIndex {
  /** Entry count above which [[GraftManifestFileIndex.listFiles]] runs
    * the bounds/bloom pruning walk on parallel driver threads instead
    * of a serial loop (fork-join overhead is not worth paying below
    * it). Var so specs/benches can force either path on any fixture.
    */
  @volatile var distributedPruneThreshold: Int = 20000
}

/** File index over manifest entries. Thread-safe and immutable: the
  * entry list is fixed at construction (a snapshot is immutable), so
  * `refresh` is a no-op and repeated `listFiles` calls are pure.
  */
final class GraftManifestFileIndex(
    hadoopConf: org.apache.hadoop.conf.Configuration,
    tableRoot: Path,
    entries: Seq[DataFileEntry],
    override val partitionSchema: StructType,
    transformProjection: Seq[Expression] => DataFileEntry => Boolean =
      _ => _ => true) extends FileIndex {

  private val qualifiedRoot: Path = {
    val fs = tableRoot.getFileSystem(hadoopConf)
    fs.makeQualified(tableRoot)
  }

  // per-entry (partition values internal row, file status); partition
  // values parse once at construction from the hive path segments the
  // manifest recorded — no storage round-trip anywhere in this class
  private val files: Seq[(InternalRow, FileStatusWithMetadata, DataFileEntry)] =
    entries.map { e =>
      val status = new FileStatus(e.bytes, false, 1, 128L * 1024 * 1024, 0L,
        new Path(qualifiedRoot, e.path))
      (partitionValues(e), FileStatusWithMetadata(status, Map.empty), e)
    }

  override def rootPaths: Seq[Path] = Seq(qualifiedRoot)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val partPruned =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) files
      else {
        val predicate = Predicate.createInterpreted(bindByName(partitionFilters))
        files.filter { case (values, _, _) => predicate.eval(values) }
      }
    val survivors =
      if (dataFilters.isEmpty) partPruned
      else {
        // hidden-partitioning projection: a conjunct equality on a
        // transform SOURCE column implies an exact derived directory
        // value (`id = 5` on a `bucket(16, id)` table keeps only
        // bucket(5)'s files) — source min/max bounds alone cannot see
        // this, a hash scatters the source range across every bucket
        val derived = transformProjection(dataFilters)
        if (partPruned.size <= GraftManifestFileIndex.distributedPruneThreshold)
          partPruned.filter { case (_, _, e) =>
            dataFilters.forall(Manifests.mayMatch(_, e)) && derived(e)
          }
        else {
          // parallel plan-time pruning: at 10⁵-10⁶ manifest entries the
          // serial bounds/bloom walk starts to serialize planning — the
          // walk is embarrassingly parallel, so it fans out over DRIVER
          // threads. Measured against the alternative of a Spark job:
          // shipping bloom-carrying entries through task serialization
          // costs ~2.5× the whole serial walk at 10⁵ entries (and grows
          // with entry width), while the in-process parallel walk pays
          // zero serialization and scales with driver cores. mayMatch is
          // pure; the transform projection's closure comes from catalog
          // code and is not guaranteed thread-safe, so it stays on the
          // caller thread over the bounds survivors.
          val arr = partPruned.toIndexedSeq
          val filters = dataFilters
          val keep = java.util.stream.IntStream.range(0, arr.size).parallel()
            .filter(i => filters.forall(Manifests.mayMatch(_, arr(i)._3)))
            .toArray
          keep.iterator.map(arr(_)).filter(t => derived(t._3)).toSeq
        }
      }
    survivors.groupBy(_._1).toSeq.map { case (values, group) =>
      PartitionDirectory(values, group.map(_._2))
    }
  }

  override def inputFiles: Array[String] =
    files.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = entries.map(_.bytes).sum

  /** Resolve filter attributes to partition-schema ordinals by
    * (case-insensitive) name: the filters reference the relation's
    * output attributes, whose exprIds this index never sees.
    */
  private def bindByName(filters: Seq[Expression]): Expression = {
    val idx = partitionSchema.fields.zipWithIndex.map {
      case (f, i) => f.name.toLowerCase(java.util.Locale.ROOT) -> i
    }.toMap
    filters.reduce(org.apache.spark.sql.catalyst.expressions.And).transform {
      case a: AttributeReference =>
        idx.get(a.name.toLowerCase(java.util.Locale.ROOT)) match {
          case Some(i) =>
            val f = partitionSchema.fields(i)
            BoundReference(i, f.dataType, nullable = true)
          case None =>
            // partition filters only reference partition columns; an
            // unknown name means a contract break upstream — fail loud
            throw new IllegalStateException(
              s"Partition filter references non-partition column ${a.name}")
        }
    }
  }

  /** Per-entry partition values → InternalRow in partition-schema order.
    * An EXACT manifest bound (min = max, zero nulls) wins over the hive
    * path segments: it is the manifest-authoritative value, and for an
    * attached Iceberg tree whose data files don't store the identity
    * column at all (the spec's Column Projection rule — e.g. a graft
    * export re-registered) it is the ONLY source; a nulls-only bound
    * covering every row marks an all-null partition. Native tables fold
    * the path value into the bounds at commit time, so the two sources
    * agree wherever both exist. `_snap` and derived transform columns
    * never have bounds and always parse from the path, casting the
    * (unescaped) strings to the declared types the same way partition
    * discovery would.
    */
  private def partitionValues(e: DataFileEntry): InternalRow = {
    if (partitionSchema.isEmpty) return InternalRow.empty
    val relPath = e.path
    lazy val segs = relPath.split('/').dropRight(1).iterator.flatMap { seg =>
      val eq = seg.indexOf('=')
      if (eq <= 0) None
      else Some(seg.substring(0, eq).toLowerCase(java.util.Locale.ROOT) ->
        Manifests.unescapePathName(seg.substring(eq + 1)))
    }.toMap
    def fromPath(f: StructField): Any =
      segs.get(f.name.toLowerCase(java.util.Locale.ROOT)) match {
        case None => null
        case Some("__HIVE_DEFAULT_PARTITION__") => null
        case Some(raw) =>
          if (f.dataType == StringType) UTF8String.fromString(raw)
          else Cast(Literal(UTF8String.fromString(raw), StringType), f.dataType,
            Some(SQLConf.get.sessionLocalTimeZone)).eval(null)
      }
    val values: Array[Any] = partitionSchema.fields.map { f =>
      val cb = e.bounds.collectFirst {
        case (n, b) if n.equalsIgnoreCase(f.name) => b }
      cb match {
        case Some(b) if b.min == null && b.max == null && b.nulls == e.rows =>
          null // all-null partition (rows == 0 degenerates to null too)
        case Some(b) if b.min != null && b.min == b.max && b.nulls == 0L =>
          boundPartitionValue(f.dataType, b).getOrElse(fromPath(f))
        case _ => fromPath(f)
      }
    }
    new GenericInternalRow(values)
  }

  /** Exact bound → Catalyst partition value for the declared type, or
    * None when the bound's KIND has no unambiguous conversion (then the
    * hive path parse decides, as before). Kind-aware because attached
    * Iceberg bounds store date/timestamp as epoch numbers while native
    * hive paths render them as date strings.
    */
  private def boundPartitionValue(dt: DataType,
                                  b: graft.catalog.ColBounds): Option[Any] =
    try (dt, b.kind) match {
      case (StringType, _) => Some(UTF8String.fromString(b.min))
      case (types.IntegerType, "long") => Some(b.min.toLong.toInt)
      case (types.LongType, "long") => Some(b.min.toLong)
      case (types.DateType, "date" | "long") => Some(b.min.toLong.toInt)
      case (types.DateType, "string") =>
        Some(java.time.LocalDate.parse(b.min).toEpochDay.toInt)
      case (types.TimestampType | types.TimestampNTZType, "ts" | "long") =>
        Some(b.min.toLong) // micros
      case (types.DoubleType, "double" | "long") => Some(b.min.toDouble)
      case (types.FloatType, "double" | "long") => Some(b.min.toFloat)
      case _ => None
    } catch { case _: RuntimeException => None }

}
