package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication family for training-data pipelines (SURVEY.md §7.5):
  * exact, word-set Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: exact dedup is one hash-shuffle on the text (or its
  * 64-bit fingerprint). Pairwise Jaccard is only ever computed within
  * bounded candidate groups — either an explicit partition key (`source`)
  * or LSH band buckets — never as an unbounded self-join. At 100 TB the
  * LSH path is the only admissible one and everything here composes from
  * shuffles on small keys + per-group work.
  */
object Dedup {

  /** Exact dedup: canonical doc per distinct text (min doc_id), with
    * multiplicity. One shuffle on the text hash; map-side partial agg.
    */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** Fingerprint-based exact dedup — at scale you shuffle the 8-byte
    * xxhash64, not the full text. Same kept-set as dedupExact modulo hash
    * collisions (~0 at 2^64).
    */
  def dedupByFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(xxhash64(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  private def wordSet(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("source"),
      explode(array_distinct(split(lower(trim(col("text"))), "\\s+"))).as("w"))

  /** Word-set (1-gram) Jaccard near-dup pairs within a bounded candidate
    * group (same `source`). The inverted-index join (token → doc list)
    * computes intersections without materializing document pairs that share
    * nothing.
    */
  def nearDupJaccard(s: SparkSession, d: String): DataFrame = {
    // each exploded word row carries its document's distinct-word count, so
    // the jaccard denominator falls out of the pair group-by — no separate
    // count joins, one shuffle for the inverted index + one for the pairs
    val words = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        array_distinct(split(lower(trim(col("text"))), "\\s+")).as("ws"))
      .select(col("doc_id"), col("source"), size(col("ws")).as("n"),
        explode(col("ws")).as("w"))
    words.as("a")
      .join(words.as("b"),
        col("a.w") === col("b.w") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id") &&
          // length-ratio prefilter, semantics-preserving for J >= 0.8:
          // i <= min(na,nb) and J = i/(na+nb-i) >= 0.8 force
          // 5*min(na,nb) >= 4*max(na,nb) — cuts posting pairs before the
          // group-by without changing the qualifying set
          col("a.n") * 5 >= col("b.n") * 4 && col("b.n") * 5 >= col("a.n") * 4)
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("i"))
      .select(col("da"), col("db"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("da"), col("db"))
  }

  // ---- MinHash + LSH ----

  /** 3-gram shingles hashed to 64 bits, as an array column. Tokenization is
    * projected into its own column first (`toksCol`) so the split runs once
    * per row — referencing `split(...)` inside the lambda would recompute it
    * per shingle (O(T²) per document).
    */
  private[operators] def withShingleHashes(df: DataFrame): DataFrame =
    df.withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("sh",
        expr("transform(sequence(0, greatest(size(toks) - 3, 0)), " +
          "i -> xxhash64(concat_ws(' ', slice(toks, i + 1, 3))))"))
      .drop("toks")

  /** Universal-hash parameters for the K minhash permutations over the
    * 31-bit prime field 2^31-1: the shingle hash is first reduced mod P, so
    * `reduced * a + b < 2^62` never overflows Long under ANSI arithmetic.
    */
  private val P = 2147483647L // 2^31 - 1
  private val hashParams: Seq[(Long, Long)] =
    (0 until 16).map(k => (2L * k + 1001L, 7919L * (k + 1)))

  /** Per-document MinHash signature (K=16) + LSH band keys (4 bands × 4
    * rows). Pure expression work — the signature computation never
    * shuffles.
    */
  def minhashSignatures(s: SparkSession, d: String): DataFrame = {
    val withShingles = withShingleHashes(
      Tables.documents(s, d).select(col("doc_id"), col("text"))).drop("text")
    val sigCols = hashParams.zipWithIndex.map { case ((a, b), k) =>
      expr(s"array_min(transform(sh, h -> pmod(pmod(h, ${P}L) * ${a}L + ${b}L, ${P}L)))").as(s"m$k")
    }
    val sig = withShingles.select(col("doc_id") +: sigCols: _*)
    (0 until 4).foldLeft(sig) { (df, band) =>
      val cols = (0 until 4).map(r => s"m${band * 4 + r}").mkString(", ")
      df.withColumn(s"band$band", expr(s"xxhash64($cols)"))
    }
  }

  /** MinHash-LSH near-dup pairs: band-bucket join generates candidates (only
    * docs agreeing on a full band collide), then exact shingle-set Jaccard
    * verifies. The candidate join is on (band index, band hash) — tiny keys,
    * no quadratic blowup; this is the 100 TB path.
    */
  def minhashLshPairs(s: SparkSession, d: String): DataFrame = {
    val sigs = minhashSignatures(s, d)
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until 4).map(b => col(s"band$b")): _*)).as(Seq("band_idx", "band_hash")))
    val candidates = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    val shingles = withShingleHashes(
      Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), array_distinct(col("sh")).as("shs"))
    candidates
      .join(shingles.as("sa"), col("da") === col("sa.doc_id"))
      .join(shingles.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        (size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("double") /
          size(array_union(col("sa.shs"), col("sb.shs")))).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .orderBy(col("da"), col("db"))
  }

  /** 64-bit SimHash over word hashes: bit i of the signature is the sign of
    * the per-bit vote sum. Near-dups differ in few bits (Hamming distance).
    */
  def simhash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("transform(split(lower(trim(text)), '\\\\s+'), w -> xxhash64(w))").as("hs"))
      .select(col("doc_id"),
        expr(
          """aggregate(
            |  sequence(0, 63),
            |  0L,
            |  (acc, b) -> acc + if(
            |    aggregate(hs, 0L, (v, h) -> v + if((shiftright(h, b) & 1) = 1, 1L, -1L)) >= 0,
            |    shiftleft(1L, b), 0L)
            |)""".stripMargin).as("simhash"))
      .orderBy(col("doc_id"))
}
