package graft.mapper

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Incremental row cursor over a query result — the engine's analogue of
  * the reference's ADO.NET data-reader surface (reference
  * tests/IntegrationTests/TrinoAdoNetIntegrationTests.cs:57-119:
  * ExecuteReader / Read / IsDBNull / FieldCount / GetName).
  *
  * Backed by `Dataset.toLocalIterator`, which runs one Spark job per
  * partition on demand and holds at most one partition's rows on the
  * driver — results larger than driver memory stream through; nothing
  * `collect()`-shaped ever runs. Single-threaded use, like DbDataReader:
  * `read()` advances the cursor; field accessors address the current row.
  */
final class GraftRowReader private[graft] (df: DataFrame) {

  /** Result schema — available before the first `read()`, the parity
    * point with the reader's FieldCount/GetName metadata surface.
    */
  val schema: StructType = df.schema

  private val it = df.toLocalIterator()
  private var cur: Row = _

  def fieldCount: Int = schema.length
  def fieldName(i: Int): String = schema(i).name
  def ordinal(name: String): Int = schema.fieldIndex(name)

  /** Advance to the next row; false when exhausted (DbDataReader.Read). */
  def read(): Boolean =
    if (it.hasNext) { cur = it.next(); true } else { cur = null; false }

  private def row: Row = {
    if (cur == null)
      throw new IllegalStateException(
        "Reader is not positioned on a row — call read() first")
    cur
  }

  def isNull(i: Int): Boolean = row.isNullAt(i)
  def isNull(name: String): Boolean = row.isNullAt(ordinal(name))
  def get(i: Int): Any = row.get(i)
  def getAs[T](i: Int): T = row.getAs[T](i)
  def getAs[T](name: String): T = row.getAs[T](name)

  /** Null-safe field access — the `IsDBNull` idiom folded into Option. */
  def getOption[T](name: String): Option[T] = {
    val i = ordinal(name)
    if (row.isNullAt(i)) None else Some(row.getAs[T](i))
  }
}
