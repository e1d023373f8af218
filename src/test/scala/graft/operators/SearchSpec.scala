package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Correctness specs for the retrieval / LM-scoring operators on planted
  * fixtures where the expected statistics are hand-computable.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def plant(docs: Seq[(Long, String)]): String = {
    val dir = tmpDir("search-docs")
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s1"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25TopK ranks term-dense short docs first, counts hits, drops no-hit docs") {
    val dir = plant(Seq(
      (1L, "spark spark spark"),                       // tf=3, dl=3
      (2L, "spark filler filler filler filler filler"), // tf=1, dl=6
      (3L, "nothing relevant here at all"),             // no hits
      (4L, "spark engine")))                            // tf=1, dl=2
    val got = Search.bm25TopK(spark, dir, terms = Seq("spark"), k = 10)
      .select($"doc_id", $"n_hits", $"score").as[(Long, Int, Double)].collect()
    assert(got.map(_._1).toSet == Set(1L, 2L, 4L), "doc 3 has no query term")
    assert(got.forall(_._2 == 1))
    // highest tf + shortest dl wins; tf=1: shorter doc beats longer doc
    assert(got.map(_._1).toSeq == Seq(1L, 4L, 2L))
    assert(got.forall(_._3 > 0.0))
  }

  test("bm25TopK idf downweights ubiquitous terms against rare ones") {
    val dir = plant(Seq(
      (1L, "common rare"),
      (2L, "common x"),
      (3L, "common y"),
      (4L, "common z")))
    // 'common' in 4/4 docs → idf_odds (4-4+0.5)/(4+0.5) = 1/9;
    // 'rare' in 1/4  → (4-1+0.5)/(1+0.5) = 7/3. Doc 1 matches both.
    val got = Search.bm25TopK(spark, dir, terms = Seq("common", "rare"), k = 10)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    assert(got(1L) > 10 * got(2L), s"rare-term doc must dominate: $got")
  }

  test("unigramRarity computes exact scaled-integer sums") {
    val dir = plant(Seq(
      (1L, "a a b"),
      (2L, "a c")))
    // counts: a=3, b=1, c=1; total=5. rar(a)=5e6 div 3=1666666, rar(b)=rar(c)=5e6.
    val got = Search.unigramRarity(spark, dir)
      .select($"doc_id", $"n_tokens", $"sum_rarity").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1666666L * 2 + 5000000L),
      (2L, 2L, 1666666L + 5000000L)))
  }

  test("unigramRarity mean and band agree with the sum") {
    val dir = plant(Seq((1L, "a a b"), (2L, "a c")))
    val rows = Search.unigramRarity(spark, dir)
      .select($"doc_id", $"mean_rarity", $"band").as[(Long, Double, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (m1, b1) = rows(1L)
    assert(math.abs(m1 - (1666666.0 * 2 + 5000000.0) / 3e6) < 1e-12)
    assert(b1 == "common" || b1 == "mixed" || b1 == "rare")
  }

  test("bm25Join scores a query batch with exact scaled-integer values") {
    // docs: 1="x x y" (dl=3), 2="x z" (dl=2); N=2, L=5; df: x=2, y=1, z=1.
    // Hand-computed score_micro = (2N−2df+1)·22·tf·L·10⁶ div (2df+1)·(10tfL+3L+9dlN):
    //   (q0, doc1, x, tf=2): 1·22·2·5·10⁶ div 5·(100+15+54) = 220e6 div 845 = 260355
    //   (q0, doc2, x, tf=1): 1·22·1·5·10⁶ div 5·(50+15+36)  = 110e6 div 505 = 217821
    //   (q1, doc1, y):       3·22·1·5·10⁶ div 3·(50+15+54)  = 330e6 div 357 = 924369
    //   (q1, doc2, z):       3·22·1·5·10⁶ div 3·(50+15+36)  = 330e6 div 303 = 1089108
    val dir = plant(Seq((1L, "x x y"), (2L, "x z")))
    val got = Search.bm25Join(spark, dir,
      queries = Seq(0 -> Seq("x"), 1 -> Seq("y", "z")), k = 10)
      .select($"query_id", $"doc_id", $"n_hits", $"score_micro", $"rn")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0, 1L, 1L, 260355L, 1L),   // higher tf wins query 0
      (0, 2L, 1L, 217821L, 2L),
      (1, 2L, 1L, 1089108L, 1L),  // shorter doc wins query 1 (length norm)
      (1, 1L, 1L, 924369L, 2L)), s"got $got")
  }

  test("bm25Join: unseen terms contribute nothing; multi-term queries sum per-term scores") {
    val dir = plant(Seq((1L, "x x y"), (2L, "x z")))
    val got = Search.bm25Join(spark, dir,
      queries = Seq(7 -> Seq("x", "y", "never_in_corpus")), k = 10)
      .select($"doc_id", $"n_hits", $"score_micro").as[(Long, Long, Long)]
      .collect().toSeq
    // doc1 matches x (260355) + y (924369); doc2 matches x only
    assert(got == Seq((1L, 2L, 260355L + 924369L), (2L, 1L, 217821L)), s"got $got")
  }
}
