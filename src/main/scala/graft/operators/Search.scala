package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword retrieval and statistical language-model scoring over the
  * `documents` table — the search/quality layer of a training-data
  * pipeline (rank candidate documents for a topic, score documents by
  * how "surprising" their token stream is under a corpus unigram model).
  *
  * The reference has no retrieval operator (its surface is SQL through
  * Trino, reference src/AthenaTrinoClient/AthenaClient.cs:213-225); these
  * extend the engine the same way the dedup/ANN family does: declarative
  * plans whose shuffles carry small keys, never the corpus payload.
  *
  * Cross-engine determinism (the driver hash-compares against DuckDB):
  * no transcendental functions — BM25's `ln` idf is replaced by its
  * rational odds argument (order-preserving per term, since ln is
  * monotone), and per-token rarity is computed in scaled INTEGER
  * arithmetic so sums are exact and reduction-order independent. All
  * remaining double arithmetic is +,-,*,/ on identical operands, which
  * IEEE 754 rounds identically in both engines.
  */
object Search {

  /** Default query for the demo corpus (TESTDATA.md documents vocab). */
  val QueryTerms: Seq[String] = Seq("vector", "merge", "hash", "stream")

  private val K1 = "1.2"
  private val K1p1 = "2.2"
  private val B = "0.75"

  /** BM25-family top-k retrieval for a small bag of query terms.
    *
    * Shape (the 100 TB story): ONE corpus-wide shuffle — the per-doc
    * `groupBy(doc_id)` computing document length and each query term's tf
    * as a conditional aggregate (map-side partial, 8-byte key). Corpus
    * statistics (N, total length, per-term df) are a second aggregation
    * over the per-doc table (tiny), broadcast back as a 1-row literal.
    * The query-term list itself never shuffles: it is compiled into the
    * aggregation expressions. Top-k is `orderBy(...).limit(k)` →
    * TakeOrderedAndProject (per-partition heaps + driver merge of k
    * rows), never a global sort.
    *
    * Scoring: idf_odds(t) = (N - df + 0.5)/(df + 0.5) — the argument of
    * BM25's `ln` idf (log-free for bit-exact cross-engine doubles; ln is
    * monotone so per-term ordering is preserved) — times the standard
    * saturated tf term tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)) with
    * k1=1.2, b=0.75 (Robertson & Spärck Jones BM25).
    */
  def bm25TopK(s: SparkSession, d: String, terms: Seq[String] = QueryTerms,
               k: Int = 25): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, "small fixed query bag")
    val toks = Tables.documents(s, d).select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("w") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val perDoc = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), tfAggs: _*)
    val statAggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len")) ++
      terms.indices.map(i => sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)

    // identical double expression text on both engines: every literal is an
    // explicit double cast, every operand grouping is parenthesized
    def termScore(i: Int): Column = expr(
      s"((cast(n_docs as double) - cast(df$i as double) + cast(0.5 as double)) / " +
        s"(cast(df$i as double) + cast(0.5 as double))) * " +
        s"(cast(tf$i as double) * cast($K1p1 as double)) / " +
        s"(cast(tf$i as double) + cast($K1 as double) * " +
        s"(cast(1 as double) - cast($B as double) + " +
        s"cast($B as double) * cast(dl as double) / avgdl))")

    val score = terms.indices.map(termScore).reduce(_ + _) // fixed left-assoc order
    val nHits = terms.indices
      .map(i => when(col(s"tf$i") > 0, 1).otherwise(0)).reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .withColumn("avgdl", expr("cast(total_len as double) / cast(n_docs as double)"))
      .select(col("doc_id"), col("dl"), nHits.cast("int").as("n_hits"), score.as("score"))
      .filter(col("n_hits") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB twin of [[bm25TopK]] — same conditional-aggregate shape, same
    * parenthesization, decimal literals cast to DOUBLE (DuckDB would
    * otherwise compute them in DECIMAL with different rounding).
    */
  def bm25TopKSql(terms: Seq[String] = QueryTerms, k: Int = 25): String = {
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      // '' -escape the term so a quote in a query term yields valid SQL with
      // the same semantics as the Spark side's col("w") === t
      s"SUM(CASE WHEN w = '${t.replace("'", "''")}' THEN 1 ELSE 0 END) AS tf$i"
    }.mkString(", ")
    val dfCols = terms.indices.map { i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i"
    }.mkString(", ")
    val scoreTerms = terms.indices.map { i =>
      s"((cast(n_docs as double) - cast(df$i as double) + cast(0.5 as double)) / " +
        s"(cast(df$i as double) + cast(0.5 as double))) * " +
        s"(cast(tf$i as double) * cast($K1p1 as double)) / " +
        s"(cast(tf$i as double) + cast($K1 as double) * " +
        s"(cast(1 as double) - cast($B as double) + " +
        s"cast($B as double) * cast(dl as double) / avgdl))"
    }.mkString(" + ")
    val hitTerms = terms.indices
      .map(i => s"(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH toks AS (SELECT doc_id,
       |                unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
       |              FROM documents),
       |perdoc AS (SELECT doc_id, count(*) AS dl, $tfCols FROM toks GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n_docs, SUM(dl) AS total_len, $dfCols FROM perdoc),
       |j AS (SELECT p.*, s.*, cast(total_len as double) / cast(n_docs as double) AS avgdl
       |      FROM perdoc p CROSS JOIN stats s)
       |SELECT doc_id, dl, CAST($hitTerms AS INT) AS n_hits, $scoreTerms AS score
       |FROM j WHERE ($hitTerms) > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Default multi-query batch for [[bm25Join]] (documents-table vocab). */
  val QueryBatch: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("vector", "merge"),
    1 -> Seq("hash", "stream"),
    2 -> Seq("vector", "hash", "stream"),
    3 -> Seq("merge"))

  /** JOIN-shaped BM25 over an arbitrary QUERY BATCH — the retrieval shape
    * a pipeline actually runs (round-6 verdict #5): query terms are a
    * RELATION (query_id, w) joined to the token stream, scored per
    * (doc, query), top-k per query. No per-term compiled columns, so the
    * batch size is unbounded ([[bm25TopK]] stays as the ≤16-term compiled
    * fast path for a single query).
    *
    * Shape (the 100 TB story): the corpus is tokenized once; shuffle 1 is
    * the per-doc length aggregation (8-byte key, map-side partial);
    * shuffle 2 aggregates tf over the token stream FILTERED by the
    * broadcast query relation — its volume is the matched tokens only.
    * Document-frequency and corpus stats are vocabulary/1-row sized and
    * broadcast back. Ranking is one window per query_id over the scored
    * (doc × query) table — already ≪ corpus.
    *
    * Scoring is BM25 (k1=1.2, b=0.75) with the log-free idf-odds of
    * [[bm25TopK]], quantized to EXACT SCALED INTEGERS: with N docs, L
    * total tokens, per-term
    *   score_micro = (2N−2df+1)·22·tf·L·10⁶ div (2df+1)·(10·tf·L+3·L+9·dl·N)
    * — the rational BM25 term times 10⁶, floored. Integer sums are
    * reduction-order independent (the 1000-executor determinism property)
    * and the arithmetic rides decimal(38,0)/HUGEINT, overflow-free for
    * any corpus whose token count fits in int64.
    */
  def bm25Join(s: SparkSession, d: String,
               queries: Seq[(Int, Seq[String])] = QueryBatch,
               k: Int = 10): DataFrame = {
    import s.implicits._
    val qdf = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "w")
    val toks = Tables.documentsPar(s, d).select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    val perDoc = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    val tdf = toks.join(broadcast(qdf.select("w").distinct()), Seq("w"))
      .groupBy(col("w")).agg(countDistinct(col("doc_id")).as("df"))
    val tf = toks.join(broadcast(qdf), Seq("w"))
      .groupBy(col("query_id"), col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(broadcast(tdf), Seq("w"))
      .join(perDoc, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("t_micro", expr(
        "(cast(2*n_docs - 2*df + 1 as decimal(38,0)) * 22 * tf * total_len * 1000000) div " +
          "(cast(2*df + 1 as decimal(38,0)) * " +
          "(cast(10 as decimal(38,0))*tf*total_len + cast(3 as decimal(38,0))*total_len + " +
          "cast(9 as decimal(38,0))*dl*n_docs))"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), sum(col("t_micro")).as("score_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("doc_id"), col("n_hits"), col("score_micro"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** DuckDB twin of [[bm25Join]] — the query batch as a VALUES relation,
    * HUGEINT for the 128-bit products, `//` floor division (all operands
    * positive, so it matches Spark's truncating `div`).
    */
  def bm25JoinSql(queries: Seq[(Int, Seq[String])] = QueryBatch,
                  k: Int = 10): String = {
    val qRows = queries.flatMap { case (q, ts) =>
      ts.map(t => s"($q, '${t.replace("'", "''")}')")
    }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id,
       |                unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
       |              FROM documents),
       |q(query_id, w) AS (VALUES $qRows),
       |perdoc AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n_docs, SUM(dl) AS total_len FROM perdoc),
       |tdf AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks
       |        WHERE w IN (SELECT DISTINCT w FROM q) GROUP BY w),
       |tf AS (SELECT query_id, doc_id, w, count(*) AS tf
       |       FROM toks JOIN q USING (w) GROUP BY 1, 2, 3),
       |scored AS (SELECT query_id, doc_id, count(*) AS n_hits,
       |    CAST(SUM(CAST(
       |      (CAST(2*n_docs - 2*df + 1 AS HUGEINT) * 22 * tf * total_len * 1000000)
       |      // (CAST(2*df + 1 AS HUGEINT) *
       |          (CAST(10 AS HUGEINT)*tf*total_len + CAST(3 AS HUGEINT)*total_len +
       |           CAST(9 AS HUGEINT)*dl*n_docs)) AS BIGINT)) AS BIGINT) AS score_micro
       |  FROM tf JOIN tdf USING (w) JOIN perdoc USING (doc_id) CROSS JOIN stats
       |  GROUP BY 1, 2)
       |SELECT query_id, doc_id, n_hits, score_micro, rn FROM (
       |  SELECT query_id, doc_id, n_hits, score_micro,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY score_micro DESC, doc_id) AS rn
       |  FROM scored) t
       |WHERE rn <= $k ORDER BY query_id, rn""".stripMargin
  }

  /** Per-document unigram "rarity" — a corpus-trained statistical LM
    * quality signal (the CCNet/Wenzek-et-al perplexity-filter family,
    * arXiv:1911.00359, with the LM reduced to unigrams and the log
    * replaced by scaled-integer inverse frequency so the oracle is
    * hash-exact): rarity(w) = total_tokens · 10^6 div count(w), a
    * per-document exact integer sum, and mean = sum / (n · 10^6) as a
    * final double division. High mean ⇒ the document leans on tokens the
    * corpus rarely uses (domain-shifted or noisy); `band` buckets it.
    *
    * Shape: token-count aggregation (shuffle on the word), a join of the
    * token stream against the count table (vocabulary-sized — Spark
    * broadcasts it when small; at web-corpus vocabulary it degrades to a
    * hash join on the word key, still never shuffling document payloads),
    * then one per-doc aggregation. Integer sums are exact, so the result
    * is independent of partitioning and reduction order — the property
    * that lets the same number come out of a 1000-executor run.
    * (Scaled int64 overflows past ~9·10^12 corpus tokens; at that scale
    * the scale constant drops to 10^3 — the band thresholds, not the
    * eighth digit, are the signal.)
    */
  def unigramRarity(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val total = counts.agg(sum(col("cw")).as("ct"))
    toks.join(counts, Seq("w"))
      .crossJoin(broadcast(total))
      .withColumn("rar", expr("(ct * 1000000) div cw"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("rar")).as("sum_rarity"))
      .withColumn("mean_rarity",
        expr("cast(sum_rarity as double) / (cast(n_tokens as double) * cast(1000000 as double))"))
      .withColumn("band",
        when(col("mean_rarity") < 33.0, lit("common"))
          .when(col("mean_rarity") < 45.0, lit("mixed"))
          .otherwise(lit("rare")))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[unigramRarity]] — `//` is DuckDB's integer
    * division (floor; both operands positive so it matches Spark's
    * truncating `div`).
    */
  val unigramRaritySql: String =
    """WITH toks AS (SELECT doc_id,
      |                unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      |              FROM documents),
      |counts AS (SELECT w, count(*) AS cw FROM toks GROUP BY w),
      |total AS (SELECT SUM(cw) AS ct FROM counts),
      |perdoc AS (SELECT doc_id, count(*) AS n_tokens,
      |                  CAST(SUM((ct * 1000000) // cw) AS BIGINT) AS sum_rarity
      |           FROM toks JOIN counts USING (w) CROSS JOIN total
      |           GROUP BY doc_id)
      |SELECT doc_id, n_tokens, sum_rarity,
      |       cast(sum_rarity as double) / (cast(n_tokens as double) * cast(1000000 as double)) AS mean_rarity,
      |       CASE WHEN cast(sum_rarity as double) / (cast(n_tokens as double) * cast(1000000 as double)) < cast(33 as double) THEN 'common'
      |            WHEN cast(sum_rarity as double) / (cast(n_tokens as double) * cast(1000000 as double)) < cast(45 as double) THEN 'mixed'
      |            ELSE 'rare' END AS band
      |FROM perdoc ORDER BY doc_id""".stripMargin
}
