package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Codegen-capable quantile-bucket index for clustered (z-order/sorted)
  * writes: the number of `cuts` at or below the input value under
  * Spark's double comparison semantics — one binary search per row.
  *
  * Replaces the previous 63-deep `when(v >= cut, 1).otherwise(0)` add
  * chain per z column: that fold generated a method body large enough
  * to blow past the JIT compile thresholds, so the projection ran
  * interpreted — executor stack sampling of zorder_demo put the
  * generated projection at ~70% of executor compute (guide §4:
  * per-task work; §1 measure first). Identical semantics, pinned by
  * QuantileBucketSpec's differential test:
  *
  *   - null input → bucket 0 (`when(null >= c, …)` always fell through)
  *   - NaN counts EVERY cut (Spark's `>=` orders NaN greatest)
  *   - -0.0 equals 0.0 (Spark compares primitively on equality)
  */
case class QuantileBucket(child: Expression, cuts: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quantile_bucket needs a double input, got ${child.dataType}")

  // null maps to bucket 0, so eval handles null itself (no nullSafeEval)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else QuantileBucket.bucketOf(v.asInstanceOf[Double], cuts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cutsRef = ctx.addReferenceObj("qbCuts", cuts, "double[]")
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = ${c.isNull} ? 0
          : graft.functions.QuantileBucket.bucketOf(${c.value}, $cutsRef);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantileBucket {
  /** Count of `cuts` (bitwise-distinct, total-order ascending — i.e.
    * exactly `cutsAll.distinct.sorted`, never NaN) with `v >= cut` under
    * Spark double comparison: NaN sorts greatest, -0.0 == 0.0. The probe
    * is normalized (-0.0 → 0.0) so a binary search over the total-order
    * array (where -0.0 < 0.0) lands AFTER a -0.0 cut, matching Spark's
    * `0.0 >= -0.0` = true; a cut array holding both zeros counts both,
    * exactly like the two `when(v >= cut)` terms the old chain emitted.
    */
  def bucketOf(v0: Double, cuts: Array[Double]): Int = {
    if (java.lang.Double.isNaN(v0)) return cuts.length
    val v = if (v0 == 0d) 0d else v0 // -0.0 == 0.0 in Spark comparisons
    val idx = java.util.Arrays.binarySearch(cuts, v)
    if (idx >= 0) idx + 1 else -idx - 1
  }

  def bucket(v: Column, cuts: Array[Double]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      QuantileBucket(org.apache.spark.sql.GraftSqlBridge.expression(v), cuts))
}
