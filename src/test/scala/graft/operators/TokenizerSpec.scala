package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Correctness specs for the tokenizer-training / corpus-subsampling
  * operators on planted fixtures with hand-computable statistics.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def plant(docs: Seq[(Long, String)]): String = {
    val dir = tmpDir("tok-docs")
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s1"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bpePairCounts counts adjacent pairs weighted by word frequency") {
    // vocab: abab ×3, abc ×1, x ×1 (dropped: length < 2)
    val dir = plant(Seq(
      (1L, "abab abab abc"),
      (2L, "abab x")))
    val got = Tokenizer.bpePairCounts(spark, dir, k = 10)
      .select($"pair", $"n_words", $"total_count").as[(String, Long, Long)]
      .collect().toSeq
    // abab: pairs ab,ba,ab → ab×2, ba×1 per occurrence; freq 3.
    // abc: ab, bc; freq 1.  totals: ab = 2*3 + 1 = 7, ba = 3, bc = 1.
    assert(got == Seq(("ab", 2L, 7L), ("ba", 1L, 3L), ("bc", 1L, 1L)),
      s"unexpected pair stats: $got")
  }

  test("bpePairCounts: top-k argmax is the most frequent pair") {
    val dir = plant(Seq((1L, "zz zz zz qq")))
    val top = Tokenizer.bpePairCounts(spark, dir, k = 1)
      .select($"pair").as[String].collect().toSeq
    assert(top == Seq("zz"))
  }

  test("weightedSample is deterministic, PPS-correct, and includes certain docs") {
    // 40 small docs + 1 huge doc whose p_i = min(1, w·n/(5W)) is certainly 1
    val small = (1L to 40L).map(i => (i, s"doc $i " + ("a" * (i % 7).toInt)))
    val dir = plant(small :+ (99L, "X" * 100000))
    val run1 = Tokenizer.weightedSample(spark, dir)
      .select($"doc_id", $"p_include", $"ht_weight")
      .as[(Long, Double, Double)].collect().toSeq
    val run2 = Tokenizer.weightedSample(spark, dir)
      .select($"doc_id", $"p_include", $"ht_weight")
      .as[(Long, Double, Double)].collect().toSeq
    assert(run1 == run2, "sample must be identical across reruns")
    assert(run1.map(_._1).contains(99L),
      "p=1 doc (length >= 5W/n) must always be selected")
    // ht_weight is exactly 1/p_include (same double operands, same rounding)
    run1.foreach { case (id, p, w) =>
      assert(p > 0.0 && p <= 1.0, s"doc $id p=$p")
      if (p < 1.0) assert(math.abs(w * p - 1.0) < 1e-12, s"doc $id w·p=${w * p}")
      else assert(w == 1.0, s"certain doc $id must carry weight 1, got $w")
    }
  }

  test("weightedSample inclusion test survives >int64 products (decimal(38,0) arithmetic)") {
    // total_w large enough that u30·5·total_w overflows int64
    // (2^30 · 5 · 4e9 ≈ 2.1e19 > 9.2e18): plant a few multi-GB-sized
    // n_chars values by writing the column directly.
    val dir = tmpDir("tok-big")
    Seq((1L, "a", 4000000000L), (2L, "b", 4000000000L), (3L, "c", 1L))
      .toDF("doc_id", "text", "n_chars")
      .withColumn("lang", lit("en")).withColumn("source", lit("s1"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Tokenizer.weightedSample(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    // docs 1 and 2 have w·n/(5W) = 4e9·3/(5·8e9+5) ≈ 0.3 — membership is
    // hash-decided; what matters is the filter neither throws nor silently
    // wraps: the certain-exclusion doc (p ≈ 7.5e-11) must NOT appear unless
    // its u30 is < ~0.08 — verify by recomputing the exact predicate.
    val u3 = spark.sql(
      s"SELECT ${Dedup.Portable.spark60("concat('ws|', '3')")} % 1073741824L AS u")
      .as[Long].head()
    val included3 = BigInt(u3) * 5 * BigInt("8000000001") <
      BigInt(1) * 3 * BigInt(1073741824)
    assert(got.contains(3L) == included3,
      s"doc 3 inclusion must match exact BigInt predicate (u30=$u3)")
  }
}
