package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernels for the engine-portable md5-60 hash (the first 15 hex
  * digits of md5 read as an integer — see graft.operators.Dedup.Portable):
  * bit-identical to Spark's `conv(substring(md5(x),1,15),16,10)` and
  * DuckDB's `('0x' || substr(md5(x),1,15))::BIGINT`, verified by
  * PortableHashSpec against the SQL spelling.
  *
  * Exists because the hash was previously applied inside higher-order
  * function lambdas (`transform`, nested `aggregate`), which Spark
  * evaluates interpreted — per-element expression-tree walks outside
  * whole-stage codegen. The honest round-3 bench (noop sink instead of
  * count()) showed simhash spending 29 s at sf0.1 in those lambdas; these
  * expressions run the same arithmetic as tight JVM loops invoked from
  * generated code and drop it to sub-second.
  */
object PortableHash {

  private val tlMd5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** md5-60 of one UTF-8 string: first 15 hex nibbles of the digest =
    * bytes 0-6 plus the high nibble of byte 7, big-endian.
    */
  def md560(s: UTF8String): Long = {
    val md = tlMd5.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xf0L) >>> 4)
  }

  /** md5-60 per element (null elements stay null — `transform` lambda
    * semantics).
    */
  def hashWords(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) null else md560(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** n-gram shingles of a token array: windows of `n` tokens joined by a
    * single space, md5-60, reduced mod `mod`. Window starts run 0 ..
    * max(size-n, 0) and the final windows clamp at the array end —
    * exactly `transform(sequence(0, greatest(size-n, 0)),
    * i -> md560(concat_ws(' ', slice(toks, i+1, n))) % mod)`.
    */
  def shingleHash(toks: ArrayData, n: Int, mod: Long): ArrayData = {
    val size = toks.numElements()
    val count = math.max(size - n, 0) + 1
    val out = new Array[Any](count)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < count) {
      val upper = math.min(i + n, size)
      val parts = new Array[UTF8String](upper - i)
      var j = i
      while (j < upper) { parts(j - i) = toks.getUTF8String(j); j += 1 }
      out(i) = md560(UTF8String.concatWs(space, parts: _*)) % mod
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash over pre-hashed tokens: bit b of the signature is set when
    * the per-bit vote sum (+1 when bit b of a hash is set, −1 otherwise;
    * duplicate tokens vote repeatedly) is ≥ 0. Empty input ⇒ all votes 0
    * ⇒ all bits set — the `aggregate`-fold semantics this replaces.
    */
  def simhash(hashes: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) >= 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** Karp-Rabin rolling hash over the code points of a string — the
    * kernel twin of `aggregate(split(text, ''), 0L, (acc, c) ->
    * pmod(acc * mult + ascii(c), mod))`: Spark's empty-regex split
    * advances per code point and `ascii` is the first code point, and
    * both operands stay non-negative so `pmod` degenerates to `%`.
    */
  def charRoll(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** All K minhash values in ONE pass over the shingle array: minimum of
    * the affine permutation (h·a_k + b_k) mod `mod` per k. Inputs are
    * already reduced mod P, so h·a + b stays far below 2^63. Empty input
    * ⇒ all-null minima (the `array_min(transform(empty))` semantics).
    */
  def minhashSig(sh: ArrayData, as: Array[Long], bs: Array[Long], mod: Long): ArrayData = {
    val k = as.length
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = sh.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % mod
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }
}

/** Base for unary expressions whose kernel is a static [[PortableHash]]
  * call: interpreted eval and generated code share the exact same JVM
  * method, so codegen'd and fallback paths cannot diverge.
  */
private[functions] trait HashKernelExpr extends UnaryExpression {
  /** Java source for the kernel invocation on operand `c`. */
  def kernelCall(c: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelCall(c)};")
}

/** md5-60 of every element of an array<string>. */
case class HashWords60(child: Expression) extends HashKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    PortableHash.hashWords(input.asInstanceOf[ArrayData])
  override def kernelCall(c: String): String =
    s"graft.functions.PortableHash.hashWords($c)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** md5-60 of the n-gram shingles of an array<string>, reduced mod `mod`. */
case class ShingleHash60(child: Expression, n: Int, mod: Long) extends HashKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    PortableHash.shingleHash(input.asInstanceOf[ArrayData], n, mod)
  override def kernelCall(c: String): String =
    s"graft.functions.PortableHash.shingleHash($c, $n, ${mod}L)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash signature of an array<bigint> of token hashes. */
case class SimHashSig(child: Expression, bits: Int) extends HashKernelExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    PortableHash.simhash(input.asInstanceOf[ArrayData], bits)
  override def kernelCall(c: String): String =
    s"graft.functions.PortableHash.simhash($c, $bits)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Karp-Rabin rolling hash of a string's code points. */
case class CharRollHash(child: Expression, mult: Long, mod: Long) extends HashKernelExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    PortableHash.charRoll(input.asInstanceOf[UTF8String], mult, mod)
  override def kernelCall(c: String): String =
    s"graft.functions.PortableHash.charRoll($c, ${mult}L, ${mod}L)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** K minhash minima of an array<bigint> of shingle hashes, one pass. */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], mod: Long)
    extends HashKernelExpr {
  require(as.length == bs.length, "minhash a/b parameter arity mismatch")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    PortableHash.minhashSig(input.asInstanceOf[ArrayData], as.toArray, bs.toArray, mod)
  // the parameter arrays live in static fields of the generated class
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as.toArray, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableHash.minhashSig($c, $asRef, $bsRef, ${mod}L);")
  }
  override def kernelCall(c: String): String =
    throw new UnsupportedOperationException("MinHashSig emits its own codegen")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry points (GraftSqlBridge wraps expressions into Columns
  * — Spark 4 made the Column constructor private).
  */
object PortableHashFunctions {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  def hashWords60(arr: Column): Column = column(HashWords60(expression(arr)))
  def charRollHash(s: Column, mult: Long, mod: Long): Column =
    column(CharRollHash(expression(s), mult, mod))
  def shingleHash60(toks: Column, n: Int, mod: Long): Column =
    column(ShingleHash60(expression(toks), n, mod))
  def simhashSig(hashes: Column, bits: Int): Column =
    column(SimHashSig(expression(hashes), bits))
  def minhashSig(sh: Column, as: Seq[Long], bs: Seq[Long], mod: Long): Column =
    column(MinHashSig(expression(sh), as, bs, mod))
}
