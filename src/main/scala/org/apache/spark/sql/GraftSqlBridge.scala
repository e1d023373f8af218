package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters of Spark 4's
  * classic API (org.apache.spark.sql.classic.ExpressionUtils) so the graft
  * library can expose custom Catalyst expressions as Columns. This is the
  * standard extension-point pattern for libraries adding native expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The raw ColumnNode tree behind a Column — what the unified Spark 4
    * Column API actually builds (`UnresolvedFunction("=", …)` etc.);
    * structural inspection must walk THIS tree, since conversion to a
    * catalyst Expression merely wraps it unresolved.
    */
  def node(c: Column): org.apache.spark.sql.internal.ColumnNode = c.node
}
