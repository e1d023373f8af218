package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen kernels must be bit-identical to the interpreted SQL
  * spellings they replaced — that equivalence is what keeps the DuckDB
  * differential oracles (which replay the SQL spelling) green.
  */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._
  import PortableHashFunctions._

  private val P = 2147483647L
  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a", "", "   leading and trailing   ",
    "unicode é中文 mixed",
    "dup dup dup dup", "It's got 'quotes' and\ttabs")

  private def docs = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))

  private val sqlMd560 = (x: String) =>
    s"cast(conv(substring(md5($x), 1, 15), 16, 10) as bigint)"

  test("HashWords60 == transform+md5 SQL spelling") {
    val rows = docs
      .withColumn("kernel", hashWords60(col("toks")))
      .withColumn("hof", expr(s"transform(toks, w -> ${sqlMd560("w")})"))
      .select("id", "kernel", "hof").collect()
    rows.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}"))
  }

  test("ShingleHash60 == transform(sequence)+slice+concat_ws+md5 spelling") {
    val rows = docs
      .withColumn("kernel", shingleHash60(col("toks"), 3, P))
      .withColumn("hof", expr(
        "transform(sequence(0, greatest(size(toks) - 3, 0)), " +
          s"i -> ${sqlMd560("concat_ws(' ', slice(toks, i + 1, 3))")} % ${P}L)"))
      .select("id", "kernel", "hof").collect()
    rows.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}"))
  }

  test("SimHashSig == nested aggregate vote fold (incl. empty word list)") {
    val bits = 48
    val rows = docs
      .withColumn("hs", hashWords60(col("toks")))
      .withColumn("kernel", simhashSig(col("hs"), bits))
      .withColumn("hof", expr(
        s"""aggregate(sequence(0, ${bits - 1}), 0L,
           |  (acc, b) -> acc + if(
           |    aggregate(hs, 0L, (v, h) -> v + if((shiftright(h, b) & 1) = 1, 1L, -1L)) >= 0,
           |    shiftleft(1L, b), 0L))""".stripMargin))
      .select("id", "kernel", "hof").collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
    // empty array: zero votes ⇒ every bit set
    assert(Seq(Seq.empty[Long]).toDF("hs").select(simhashSig(col("hs"), 4))
      .head().getLong(0) == 15L)
  }

  test("MinHashSig == 16× array_min(transform(affine)) spelling") {
    val as = (0 until 16).map(k => 2L * k + 1001L)
    val bs = (0 until 16).map(k => 7919L * (k + 1))
    val base = docs.withColumn("sh", shingleHash60(col("toks"), 3, P))
    val kernel = base.select(col("id"), minhashSig(col("sh"), as, bs, P).as("sig"))
    val hof = base.select(col("id") +: as.indices.map(k =>
      expr(s"array_min(transform(sh, h -> (h * ${as(k)}L + ${bs(k)}L) % ${P}L))").as(s"m$k")): _*)
    val joined = kernel.join(hof, "id").collect()
    joined.foreach { r =>
      val sig = r.getSeq[Long](r.fieldIndex("sig"))
      as.indices.foreach(k =>
        assert(sig(k) == r.getLong(r.fieldIndex(s"m$k")), s"id=${r.get(0)} k=$k"))
    }
  }

  test("CharRollHash == aggregate(split(text,'')) Karp-Rabin fold spelling") {
    val rows = docs
      .withColumn("kernel", charRollHash(col("text"), 131L, 1000000007L))
      .withColumn("hof", expr(
        "aggregate(split(text, ''), 0L, (acc, c) -> pmod(acc * 131 + ascii(c), 1000000007L))"))
      .select("id", "kernel", "hof").collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
  }

  test("CharRollHash randomized equivalence: 300 mixed-alphabet strings") {
    // curated alphabet: ASCII, punctuation, 2- and 3-byte UTF-8, and an
    // astral (surrogate-pair) code point — no unpaired surrogates, which
    // are not valid UTF-8 and never reach the expression from parquet
    val alphabet = ("abcXYZ019 .,!?'\"\\\t" + "éßñ中文日𝕊").toCharArray
    val rnd = new scala.util.Random(7)
    def randString(): String = {
      val sb = new StringBuilder
      (0 until rnd.nextInt(40)).foreach { _ =>
        val c = alphabet(rnd.nextInt(alphabet.length))
        // keep surrogate halves paired: 𝕊 occupies two chars in the array
        if (!Character.isSurrogate(c)) sb.append(c) else sb.append("𝕊")
      }
      sb.toString
    }
    val samples = (0 until 300).map(i => (i.toLong, randString()))
    val rows = samples.toDF("id", "text")
      .withColumn("kernel", charRollHash(col("text"), 131L, 1000000007L))
      .withColumn("hof", expr(
        "aggregate(split(text, ''), 0L, (acc, c) -> pmod(acc * 131 + ascii(c), 1000000007L))"))
      .select("id", "kernel", "hof").collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"id=${r.getLong(0)} text=${samples(r.getLong(0).toInt)._2}"))
  }

  test("kernels run inside whole-stage codegen (no interpreted fallback)") {
    val q = docs.withColumn("s", simhashSig(hashWords60(col("toks")), 48))
      .groupBy().agg(sum(col("s")))
    q.collect() // forces codegen compilation; a codegen bug would fall back silently…
    // …but the codegen span must exist: `*(n)` marks WholeStageCodegen
    // stages in the executed plan's string form
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(400))
  }
}
