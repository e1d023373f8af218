package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-training and corpus-subsampling steps of a training-data
  * pipeline. The reference has no tokenizer surface (its queries stop at
  * SQL over Trino, reference src/AthenaTrinoClient/AthenaClient.cs:213-225);
  * these extend the engine the way the dedup/ANN family does — declarative
  * plans whose expensive stages run over the VOCABULARY, not the corpus.
  */
object Tokenizer {

  /** One BPE merge-selection step: adjacent character-pair frequencies
    * over the corpus, weighted by word frequency (Sennrich et al.,
    * arXiv:1508.07909 — the statistic a byte-pair-encoding trainer
    * maximizes when picking the next merge).
    *
    * Shape (the 100 TB story): the corpus is touched ONCE — the word-count
    * aggregation (shuffle on the word, map-side partial combine). Pair
    * explosion runs over the distinct VOCABULARY (thousands of rows, not
    * billions) — the classic BPE-trainer optimization of counting pairs
    * per distinct word and multiplying by its frequency, so merge rounds
    * never rescan documents. The second shuffle carries 2-char keys from a
    * vocabulary-sized input. Top-k is TakeOrderedAndProject, not a global
    * sort.
    *
    * Output: `pair` (2-char string), `n_words` (distinct vocabulary words
    * containing the pair), `total_count` (corpus occurrences = per-word
    * position count × word frequency) — the argmax of `total_count` is the
    * trainer's next merge.
    */
  def bpePairCounts(s: SparkSession, d: String, k: Int = 30): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
      .groupBy(col("pair"))
      .agg(
        countDistinct(col("w")).as("n_words"),
        sum(col("freq")).as("total_count"))
      .orderBy(col("total_count").desc, col("pair"))
      .limit(k)
  }

  /** DuckDB twin of [[bpePairCounts]] — `list_transform(generate_series
    * (1, n), …)` is DuckDB's spelling of Spark's `transform(sequence…)`.
    */
  def bpePairCountsSql(k: Int = 30): String =
    s"""WITH vocab AS (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
       |    FROM documents) t
       |  GROUP BY w),
       |pairs AS (
       |  SELECT w, freq,
       |         unnest(list_transform(generate_series(1, length(w) - 1),
       |                               i -> substr(w, i, 2))) AS pair
       |  FROM vocab WHERE length(w) >= 2)
       |SELECT pair, count(DISTINCT w) AS n_words,
       |       CAST(SUM(freq) AS BIGINT) AS total_count
       |FROM pairs GROUP BY pair
       |ORDER BY total_count DESC, pair LIMIT $k""".stripMargin

  /** Deterministic probability-proportional-to-size Poisson sampling:
    * each document is kept independently with probability
    * p_i = min(1, w_i·n / (5·W)) (w_i = its length in chars, W = corpus
    * total, n = corpus rows — expected sample ≈ n/5, long documents
    * certain), decided by an engine-portable md5-derived uniform so the
    * SAME rows are selected on every rerun, any partitioning, and any
    * engine (the reproducibility property `TABLESAMPLE` lacks). The
    * inclusion test is exact integer arithmetic:
    * u30·5·W < w_i·n·2^30 with u30 = md5-60(doc_id) mod 2^30.
    *
    * Shape: one tiny global aggregate (n, W — 1 row, broadcast back) and
    * a stateless per-row filter; the corpus never shuffles. The inclusion
    * test runs in 128-bit integer arithmetic (decimal(38,0) on Spark,
    * HUGEINT on DuckDB): with u30 < 2^30 the products stay below 10^38
    * for any corpus whose char total and row count each fit in int64, so
    * the test is overflow-free at any realistic scale.
    *
    * `ht_weight` = 1/p_i, the Horvitz-Thompson estimator weight that makes
    * downstream corpus statistics unbiased after sampling.
    */
  def weightedSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val totals = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_w"))
    docs.crossJoin(broadcast(totals))
      .withColumn("u30",
        expr(s"${Dedup.Portable.spark60("concat('ws|', doc_id)")} % 1073741824L"))
      .filter(expr("cast(u30 as decimal(38,0)) * 5 * total_w < " +
        "cast(n_chars as decimal(38,0)) * n_docs * 1073741824"))
      .select(
        col("doc_id"), col("source"), col("n_chars"),
        expr("least(cast(1 as double), " +
          "cast(n_chars as double) * cast(n_docs as double) / " +
          "(cast(5 as double) * cast(total_w as double)))").as("p_include"),
        expr("greatest(cast(1 as double), " +
          "(cast(5 as double) * cast(total_w as double)) / " +
          "(cast(n_chars as double) * cast(n_docs as double)))").as("ht_weight"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[weightedSample]] — same integer inclusion test. */
  val weightedSampleSql: String = {
    val u30 = s"${Dedup.Portable.duck60("concat('ws|', doc_id)")} % 1073741824"
    s"""WITH totals AS (SELECT count(*) AS n_docs, SUM(n_chars) AS total_w
       |                FROM documents)
       |SELECT doc_id, source, n_chars,
       |       least(cast(1 as double),
       |             cast(n_chars as double) * cast(n_docs as double) /
       |             (cast(5 as double) * cast(total_w as double))) AS p_include,
       |       greatest(cast(1 as double),
       |                (cast(5 as double) * cast(total_w as double)) /
       |                (cast(n_chars as double) * cast(n_docs as double))) AS ht_weight
       |FROM documents CROSS JOIN totals
       |WHERE CAST(($u30) AS HUGEINT) * 5 * total_w
       |      < CAST(n_chars AS HUGEINT) * n_docs * 1073741824
       |ORDER BY doc_id""".stripMargin
  }
}
