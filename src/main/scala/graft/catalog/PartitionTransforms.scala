package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One field of a table's partition spec: an identity column or an
  * Iceberg partition transform (Trino Iceberg's `partitioning =
  * ARRAY['bucket(16, id)', 'month(ts)', …]`,
  * trino.io/docs/current/connector/iceberg.html#partitioned-tables —
  * "hidden partitioning": the table partitions on a DERIVED value while
  * queries keep addressing the source column). The engine materializes
  * the derived value as a hive `derivedName=value` directory level;
  * source columns stay stored in the data files (unlike identity
  * partitioning), so footer min/max bounds on the source keep powering
  * the DML probe's file skipping, and equality predicates additionally
  * project through the transform ([[deriveValue]]) to prune on the
  * derived directory value itself.
  */
sealed trait PartitionField {
  def source: String
  /** Hive directory key this field materializes as. */
  def derivedName: String
  /** Canonical spec text (what SHOW CREATE TABLE round-trips). */
  def specText: String
  def isIdentity: Boolean = false
  /** Write-side derivation (`dt` = the source column's declared type). */
  def derive(c: Column, dt: DataType): Column
  /** Driver-side transform of an equality literal into the derived
    * value space — the inclusive projection that lets `id = 5` prune on
    * `id_bucket=…` directories. None = not projectable for this value.
    */
  def deriveValue(v: Any, dt: DataType): Option[Any] = None
}

final case class IdentityField(source: String) extends PartitionField {
  override def derivedName: String = source
  override def specText: String = source
  override def isIdentity: Boolean = true
  override def derive(c: Column, dt: DataType): Column = c
}

/** `bucket(n, col)` — hash-bucket the source into n buckets. Uses
  * Spark's xxhash64 (seed 42) on both the write side (codegen'd column
  * function) and the literal-projection side (the same
  * XxHash64Function), so the two can never drift.
  */
final case class BucketField(source: String, n: Int) extends PartitionField {
  // the parameter is part of the directory key: after a spec retune
  // (bucket(8) → bucket(16)) old files keep their old `_bucket_8=`
  // segments, so a new-spec projection finds no bound under the new
  // name and KEEPS them (conservative) instead of comparing a mod-16
  // value against mod-8 directories and silently mis-pruning
  override def derivedName: String = s"${source}_bucket_$n"
  override def specText: String = s"bucket($n, $source)"
  override def derive(c: Column, dt: DataType): Column =
    pmod(xxhash64(c), lit(n.toLong)).cast(IntegerType)
  override def deriveValue(v: Any, dt: DataType): Option[Any] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val internal: Option[(Any, DataType)] = (dt, v) match {
      case (IntegerType, x: Number) => Some((x.intValue, IntegerType))
      case (LongType, x: Number)    => Some((x.longValue, LongType))
      case (StringType, s: String)  =>
        Some((org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType))
      case _ => None
    }
    internal.map { case (cv, cdt) =>
      java.lang.Math.floorMod(XxHash64Function.hash(cv, cdt, 42L), n.toLong).toInt
    }
  }
}

/** `truncate(w, col)` — width-truncate: strings to their first w chars,
  * integers to w-sized aligned ranges (Iceberg's truncate transform).
  */
final case class TruncateField(source: String, w: Int) extends PartitionField {
  // width in the directory key for the same reason as BucketField: a
  // retuned width must not compare against old-width directory values
  override def derivedName: String = s"${source}_trunc_$w"
  override def specText: String = s"truncate($w, $source)"
  override def derive(c: Column, dt: DataType): Column = dt match {
    case StringType => substring(c, 1, w)
    case ByteType | ShortType | IntegerType | LongType =>
      (c - pmod(c, lit(w.toLong))).cast(dt)
    case other => throw new IllegalArgumentException(
      s"truncate($w, $source): unsupported source type $other (string or integral)")
  }
  override def deriveValue(v: Any, dt: DataType): Option[Any] = (dt, v) match {
    case (StringType, s: String) => Some(s.take(w))
    case (ByteType | ShortType | IntegerType | LongType, x: Number) =>
      Some(x.longValue - java.lang.Math.floorMod(x.longValue, w.toLong))
    case _ => None
  }
}

/** `year/month/day/hour(col)` — calendar-bucket a timestamp or date
  * source in FIXED UTC (Iceberg's rule), independent of any session's
  * time zone — zone-dependent directory values would mis-prune probes
  * from differently-zoned sessions. Derived values are ordered integers
  * (2023, 202303, 20230315, 2023031509), so directory values
  * range-compare in the same order as time.
  */
final case class TimeField(source: String, unit: String) extends PartitionField {
  override def derivedName: String = s"${source}_$unit"
  override def specText: String = s"$unit($source)"
  override def derive(c: Column, dt: DataType): Column = {
    // TimestampType holds UTC micros; `year(c)` would extract calendar
    // fields in the SESSION zone — directory values would then depend on
    // the writing session's zone, and a probe from a differently-zoned
    // session (or the pinned-UTC deriveValue) would silently mis-prune.
    // Fixed rule instead (Iceberg's): transforms are UTC. The UTC date
    // is computed zone-independently from the raw epoch: floor-div to
    // days, then calendar arithmetic on DateType (which has no zone).
    val base: Column = dt match {
      case TimestampType =>
        val us = unix_micros(c)
        val day = lit(86400000000L)
        // decimal division: the day-aligned numerator can exceed 2^53,
        // where double division would round; pmod floors negatives
        date_add(to_date(lit("1970-01-01")),
          ((us - pmod(us, day)).cast(DecimalType(28, 0)) / day)
            .cast(IntegerType))
      case _ => c // DateType / TIMESTAMP_NTZ: calendar fields are zone-free
    }
    val utcHour: Column = dt match {
      case TimestampType =>
        (pmod(unix_micros(c), lit(86400000000L)) / lit(3600000000L))
          .cast(IntegerType)
      case _ => hour(c)
    }
    val y = year(base) * 10000 + month(base) * 100 + dayofmonth(base) // yyyymmdd
    (unit match {
      case "year"  => year(base)
      case "month" => year(base) * 100 + month(base)
      case "day"   => y
      case "hour"  => y * 100 + utcHour
    }).cast(IntegerType)
  }
  override def deriveValue(v: Any, dt: DataType): Option[Any] = {
    // literals project in the same fixed UTC rule the write side uses
    val zdt: Option[java.time.ZonedDateTime] = v match {
      case t: java.time.Instant   => Some(t.atZone(java.time.ZoneOffset.UTC))
      case t: java.sql.Timestamp  => Some(t.toInstant.atZone(java.time.ZoneOffset.UTC))
      case d: java.time.LocalDate => Some(d.atStartOfDay(java.time.ZoneOffset.UTC))
      case d: java.sql.Date       => Some(d.toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC))
      case _ => None
    }
    zdt.map { t =>
      val ymd = t.getYear * 10000 + t.getMonthValue * 100 + t.getDayOfMonth
      unit match {
        case "year"  => t.getYear
        case "month" => t.getYear * 100 + t.getMonthValue
        case "day"   => ymd
        case "hour"  => ymd * 100 + t.getHour
      }
    }
  }
}

object PartitionTransforms {
  private val bucketRe   = """(?i)^bucket\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)$""".r
  private val truncateRe = """(?i)^truncate\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)$""".r
  private val timeRe     = """(?i)^(year|month|day|hour)\s*\(\s*(\w+)\s*\)$""".r
  private val identRe    = """^[A-Za-z_]\w*$""".r

  /** One `partitioning = ARRAY[...]` element → field. Bare names are
    * identity partitioning (the pre-transform spelling, unchanged).
    */
  def parse(spec: String): PartitionField = spec.trim match {
    case bucketRe(n, col)   => BucketField(col, n.toInt)
    case truncateRe(w, col) => TruncateField(col, w.toInt)
    case timeRe(unit, col)  => TimeField(col, unit.toLowerCase)
    case s if identRe.matches(s) => IdentityField(s)
    case other => throw new IllegalArgumentException(
      s"Unsupported partitioning element '$other' (supported: column, " +
        "bucket(n, col), truncate(w, col), year/month/day/hour(col))")
  }
}
