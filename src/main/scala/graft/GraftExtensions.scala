package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharRollHash, DotProduct, HashWords60, IntersectCount, ShingleHash60, SimHashSig}

/** SparkSessionExtensions entry point: makes the engine's native functions
  * available in ANY session — including spark-submit / Connect deployments
  * where no driver code calls a register method — via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)` programmatically). This is the
  * cluster-grade registration path; `VectorFunctions.register` remains for
  * ad-hoc sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (children: Seq[Expression]) => DotProduct(children(0), children(1)))
        .asInstanceOf[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)])
    ext.injectFunction(
      (FunctionIdentifier("intersect_count"),
        new ExpressionInfo(classOf[IntersectCount].getName, "intersect_count"),
        (children: Seq[Expression]) => IntersectCount(children(0), children(1)))
        .asInstanceOf[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)])
    // portable-hash kernels (scalar config args must be literals)
    def constInt(e: Expression): Int = e.eval().asInstanceOf[Number].intValue
    def constLong(e: Expression): Long = e.eval().asInstanceOf[Number].longValue
    ext.injectFunction(
      (FunctionIdentifier("hash_words60"),
        new ExpressionInfo(classOf[HashWords60].getName, "hash_words60"),
        (children: Seq[Expression]) => HashWords60(children(0)))
        .asInstanceOf[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)])
    ext.injectFunction(
      (FunctionIdentifier("shingle_hash60"),
        new ExpressionInfo(classOf[ShingleHash60].getName, "shingle_hash60"),
        (children: Seq[Expression]) =>
          ShingleHash60(children(0), constInt(children(1)), constLong(children(2))))
        .asInstanceOf[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)])
    ext.injectFunction(
      (FunctionIdentifier("simhash_sig"),
        new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
        (children: Seq[Expression]) => SimHashSig(children(0), constInt(children(1))))
        .asInstanceOf[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)])
    ext.injectFunction(
      (FunctionIdentifier("char_roll_hash"),
        new ExpressionInfo(classOf[CharRollHash].getName, "char_roll_hash"),
        (children: Seq[Expression]) =>
          CharRollHash(children(0), constLong(children(1)), constLong(children(2))))
        .asInstanceOf[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)])
  }
}
