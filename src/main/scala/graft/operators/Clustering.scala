package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.dot

/** Embedding-space clustering for corpus composition control (the
  * cluster-balanced mixing family: assign documents to semantic clusters,
  * then budget the training mix per cluster instead of per raw source —
  * the DoReMi / cluster-dedup-style pipeline step that needs nothing but
  * counts per (cluster, label) to act on).
  *
  * Scale design: spherical k-means with the classic fit/assign split —
  * the Lloyd refinement runs on a BOUNDED deterministic sample (at 100 TB
  * you fit on ~10⁶ vectors, never the corpus), and only the final
  * assignment pass touches every row: one broadcast of K centroid vectors
  * and a codegen'd dot product per (row, centroid), no shuffle wider than
  * the K×dim centroid table. The per-element centroid accumulation
  * shuffles (cid, dim_index, int) triples — integer-exact and tiny.
  *
  * Cross-engine exactness: centroid elements are accumulated as INTEGER
  * sums of `floor(value × 1024)` (a 1/1024 quantization grid). Float sums
  * are order-dependent, and decimal casts round differently across
  * engines (Spark half-up, DuckDB truncating), but integer sums are
  * associative everywhere — so the DuckDB oracle replays the exact
  * clustering, hash-exact, while the quantization error (≤ 2⁻¹⁰ per
  * element against unit-scale embeddings) is far below any meaningful
  * cluster-boundary movement.
  */
object Clustering {

  private val K = 8
  private val Dim = 64
  private val QScale = 1024.0

  /** Per-(cluster, label) corpus mix after one Lloyd refinement from K
    * deterministic seeds (the K smallest vec_ids). `fit` = the vec_id % 5
    * sample; `assign` = the whole corpus. Ties break toward the smaller
    * cluster id so the argmax is total. The fit modulus is the sampling
    * knob: the demo keeps %5 so the oracle replays the exact clustering
    * at test scale; at 100 TB you raise it (%10⁴-ish) so the fit set
    * stays ~10⁶ vectors — a fixed FRACTION would not be a bounded fit.
    */
  def clusterMix(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddingsPar(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    val seeds = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("embedding").as("sv"))
    val fit = e.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding"))

    // round 1: nearest seed by dot product, fit sample only
    val w1 = Window.partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("cid"))
    val a1 = fit.crossJoin(broadcast(seeds))
      .withColumn("score", dot(col("embedding"), col("sv")))
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))

    // centroid accumulation: integer-exact per-element sums + member count
    val cnt = a1.groupBy(col("cid")).agg(count(lit(1)).as("n_fit"))
    val sums = a1.join(fit, Seq("vec_id"))
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(floor(col("v").cast("double") * lit(QScale))).as("qs"))
    val cents = sums.groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("qs")))),
        x => x("qs").cast("double")).as("cv"))
      .join(cnt, Seq("cid"))

    // round 2: assign EVERY vector to the refined centroid (mean dot =
    // dot with the quantized sum vector / member count — the constant
    // 1/QScale factor cannot change an argmax)
    val w2 = Window.partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("cid"))
    val a2 = e.crossJoin(broadcast(cents))
      .withColumn("score", dot(col("embedding"), col("cv")) / col("n_fit"))
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") === 1)

    a2.groupBy(col("cid").as("cluster"), col("label"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("cluster"), col("label"))
  }

  /** DuckDB twin of [[clusterMix]] — the same two assignment rounds with
    * `list_dot_product` and the same integer-quantized centroid sums.
    */
  val clusterMixSql: String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |seeds AS (SELECT vec_id AS cid, v AS sv FROM e WHERE vec_id < $K),
       |fit AS (SELECT vec_id, v FROM e WHERE vec_id % 5 = 0),
       |a1 AS (SELECT vec_id, cid FROM (
       |        SELECT f.vec_id, s.cid,
       |               ROW_NUMBER() OVER (PARTITION BY f.vec_id
       |                 ORDER BY list_dot_product(f.v, s.sv) DESC, s.cid) AS rn
       |        FROM fit f CROSS JOIN seeds s) t WHERE rn = 1),
       |cnt AS (SELECT cid, COUNT(*) AS n_fit FROM a1 GROUP BY cid),
       |sums AS (SELECT a1.cid, i.idx,
       |                CAST(SUM(CAST(floor(f.v[i.idx] * ${QScale.toInt}) AS BIGINT)) AS BIGINT) AS qs
       |         FROM a1 JOIN fit f USING (vec_id)
       |         CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS idx) i
       |         GROUP BY a1.cid, i.idx),
       |cents AS (SELECT cid, list(CAST(qs AS DOUBLE) ORDER BY idx) AS cv FROM sums GROUP BY cid),
       |a2 AS (SELECT vec_id, label, cid FROM (
       |        SELECT e.vec_id, e.label, c.cid,
       |               ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |                 ORDER BY list_dot_product(e.v, c.cv) / n.n_fit DESC, c.cid) AS rn
       |        FROM e CROSS JOIN cents c JOIN cnt n ON c.cid = n.cid) t WHERE rn = 1)
       |SELECT cid AS cluster, label, COUNT(*) AS n_vecs
       |FROM a2 GROUP BY cid, label ORDER BY cluster, label""".stripMargin
}
