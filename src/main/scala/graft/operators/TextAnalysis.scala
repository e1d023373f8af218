package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for training-data pipelines (north-star surface,
  * SURVEY.md §7.5): statistics, BPE-ish token counting, quality scoring,
  * language ID, content fingerprinting.
  *
  * All per-document work is pure expression-level computation (whole-stage
  * codegen, no UDFs, no shuffles) — a 100 TB corpus maps straight through.
  *
  * Heuristic formulas (quality, lang-ID) are defined once as ANSI SQL
  * fragments (`object Formulas`) and evaluated identically by Spark
  * (`expr(...)`) and the DuckDB oracle, so the differential gate covers the
  * heuristics themselves, not just the plumbing.
  */
object TextAnalysis {

  /** SQL fragments shared verbatim between Spark `expr` and the oracle. */
  object Formulas {
    /** whitespace token count (empty/blank-safe) */
    val nTokens =
      "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE size(split(trim(text), '\\\\s+')) END"
    /** DuckDB spelling of the same (size/split → len/regexp_split_to_array) */
    val nTokensDuck =
      "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"

    /** BPE-ish lexer: letter runs, digit runs, single other non-space.
      * Spark spelling is for a single-quoted SQL literal (Spark unescapes
      * `\\s` → `\s` at parse time); DuckDB takes the raw regex.
      */
    val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]"
    val bpePatternDuck = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

    /** PII patterns — restricted to the syntax subset where Java regex
      * (Spark) and RE2 (DuckDB) agree: char classes, bounded repetition,
      * `\b` word boundaries, no lookaround. Raw single-backslash spellings:
      * the Spark side passes them through the column API (no SQL-literal
      * unescaping) and DuckDB SQL literals keep backslashes verbatim.
      */
    val emailRe = """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"""
    val ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
    /** 7-14 digits with at most one `-`/space between neighbors.
      * Deliberately conservative for a PII scrub (a space-separated digit
      * run can still match — over-redaction beats leaking); the bounded
      * separator stops one match from swallowing text across `--`/`  `
      * gaps, and the repetition cap stops unbounded collapse.
      */
    val phoneRe = """\+?\d([\- ]?\d){6,13}"""

    /** Word-boundary alternation over literal terms. Each non-alphanumeric
      * char is backslash-escaped — valid and literal in BOTH Java regex
      * and RE2 (neither \Q..\E nor lookarounds are needed). Empty terms
      * are dropped; an empty LIST yields None (callers skip the step)
      * because `\b()\b` would match at every boundary. NOTE: `\b` needs a
      * word char on its inside, so a term that starts or ends with
      * punctuation ("c++") is safely literal but cannot match at that
      * edge — by regex semantics, not an escaping defect.
      */
    def blockRe(terms: Seq[String]): Option[String] = {
      val clean = terms.filter(_.nonEmpty).sorted
      if (clean.isEmpty) None
      else Some(clean.map(_.flatMap { c =>
        if (c.isLetterOrDigit || c == '_') c.toString else "\\" + c
      }).mkString("""\b(""", "|", """)\b"""))
    }

    /** per-language stopword alternations for the n-gram lang-ID heuristic */
    val langStopwords: Seq[(String, String)] = Seq(
      "en" -> "(the|and|of|a|to|in|is)",
      "de" -> "(der|die|das|und|ist|ein)",
      "es" -> "(el|la|los|de|que|es|un)",
      "fr" -> "(le|la|les|des|et|est|un)",
      "zh" -> "(的|是|了|在|和)")

    /** argmax CASE chain over the five scores; ties resolve to the
      * alphabetically-greatest language (struct-max semantics). Identical
      * text evaluated on both engines.
      */
    val langArgmax: String = {
      val langs = langStopwords.map(_._1).sorted.reverse // zh, fr, es, en, de
      val clauses = langs.init.map { l =>
        val others = langs.filter(_ != l)
        val gtEarlier = langs.takeWhile(_ != l).map(o => s"s_$l > s_$o")
        val geLater = langs.dropWhile(_ != l).tail.map(o => s"s_$l >= s_$o")
        s"WHEN ${(gtEarlier ++ geLater).mkString(" AND ")} THEN '$l'"
      }
      s"CASE ${clauses.mkString(" ")} ELSE '${langs.last}' END"
    }
  }

  /** Basic per-document statistics — the DataFrame core is side-input
    * agnostic (pure per-row expressions), so it runs unmodified on a
    * STREAMING documents source too (StreamingPipelineSpec proves
    * batch/stream agreement); the `(session, dir)` wrapper adds the
    * presentation sort a stream cannot have.
    */
  def textStatsOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("int").as("n_chars"),
      expr(Formulas.nTokens).cast("int").as("n_tokens"),
      length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("int").as("n_punct"))

  def textStats(s: SparkSession, d: String): DataFrame =
    textStatsOf(Tables.documents(s, d)).orderBy(col("doc_id"))

  /** Token counting with a BPE-ish regex lexer. */
  def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documentsPar(s, d)
      .select(
        col("doc_id"),
        size(expr(s"regexp_extract_all(text, '${Formulas.bpePattern}', 0)"))
          .cast("int").as("n_bpe_tokens"),
        expr(Formulas.nTokens).cast("int").as("n_ws_tokens"))
      .orderBy(col("doc_id"))

  /** Quality scoring: token-length / punctuation / uniqueness signals with a
    * composite keep/drop flag — the usual pre-training corpus filter shape.
    */
  def qualityScore(s: SparkSession, d: String): DataFrame =
    Tables.documentsPar(s, d)
      .withColumn("n_tokens", expr(Formulas.nTokens).cast("double"))
      .withColumn("n_uniq",
        size(array_distinct(split(lower(trim(col("text"))), "\\s+"))).cast("double"))
      .select(
        col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        (col("n_uniq") / col("n_tokens")).as("uniq_ratio"),
        (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
          length(col("text")).cast("double")).as("punct_ratio"),
        (length(col("text")).cast("double") / col("n_tokens")).as("mean_token_span"))
      .withColumn("keep",
        col("n_tokens") >= 5 && col("uniq_ratio") > 0.1 && col("punct_ratio") < 0.3)
      .orderBy(col("doc_id"))

  /** Language ID via stopword-hit scoring — same formula text as the oracle
    * (Formulas.langArgmax).
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val scored = Formulas.langStopwords.foldLeft(
      Tables.documentsPar(s, d).withColumn("lc", lower(col("text")))) {
      case (df, (l, words)) =>
        df.withColumn(s"s_$l",
          size(expr(s"regexp_extract_all(lc, '(^|\\\\s)$words(\\\\s|$$)', 0)")).cast("int"))
    }
    scored
      .withColumn("lang_guess", expr(Formulas.langArgmax))
      .select(Seq(col("doc_id"), col("lang").as("lang_label"), col("lang_guess")) ++
        Formulas.langStopwords.map { case (l, _) => col(s"s_$l") }: _*)
      .orderBy(col("doc_id"))
  }

  /** Rolling polynomial fingerprint (Karp-Rabin) over the document
    * characters — order-sensitive, unlike a bag-of-words hash — plus a
    * portable 60-bit md5 content hash. Pure fold expression: distributes
    * with the scan, no state. Both columns replicate exactly in DuckDB
    * (`fingerprintSql`), so the whole computation is oracle-checked.
    */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        // CharRollHash kernel == the HOF spelling `aggregate(split(text,
        // ''), 0L, (acc, c) -> pmod(acc*131 + ascii(c), 1000000007L))`,
        // which Spark evaluates interpreted per character (PortableHashSpec
        // asserts equality); the kernel runs inside whole-stage codegen
        graft.functions.PortableHashFunctions
          .charRollHash(col("text"), 131L, 1000000007L).as("fp"),
        expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)").as("fp60"))
      .orderBy(col("doc_id"))

  /** Top-3 TF-IDF terms per document. The idf is the rational N/df (no
    * logarithm: libm `log` is not guaranteed correctly-rounded and can
    * differ in the last ulp across engines; the ranking is the same).
    * Shape: one tf aggregation, one df aggregation, broadcast scalar N,
    * per-document top-k window — every shuffle on small keys.
    */
  def tfidfTopTerms(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsPar(s, d)
    val toks = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    // persist tf: it feeds the score projection AND the df aggregation —
    // without the persist the whole tokenize+explode+aggregate subtree
    // runs TWICE (plan inspection: two full scan→Generate→HashAggregate
    // legs, the duplicated half being the operator's dominant cost at the
    // 16× scale leg). The doc_id partitioning from documentsPar satisfies
    // the (doc_id, w) groupBy AND the top-k window, so the persisted tf is
    // the only wide state and df is a vocab-sized re-aggregation of it.
    val tf = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // plain loader for the count: the fused scan-count needs no exchange
    // (documentsPar would drag its repartition into a third table scan)
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(broadcast(dfreq), Seq("w"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("w").as("term"), col("tf"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .orderBy(col("doc_id"), col("rk"))
  }

  /** DuckDB twin of `tfidfTopTerms`. */
  val tfidfTopTermsSql: String =
    """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w FROM documents),
      |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      |nd AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (SELECT doc_id, w AS term, tf, CAST(tf * n_docs AS DOUBLE) / df AS score
      |           FROM tf JOIN dfq USING (w) CROSS JOIN nd)
      |SELECT doc_id, term, tf, score, rk FROM (
      |  SELECT doc_id, term, tf, score,
      |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      |  FROM scored) t WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** DuckDB twin of `fingerprint`: list_reduce fold over per-character code
    * points (prepended 0 accumulator = Spark's aggregate initial value).
    */
  val fingerprintSql: String =
    "SELECT doc_id, " +
      "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      "(a, b) -> (a * 131 + b) % 1000000007) AS fp, " +
      "CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fp60 " +
      "FROM documents ORDER BY doc_id"

  /** Intra-document repetition filter (the duplicate-n-gram family of
    * quality signals from Rae et al., "Scaling Language Models: … Gopher",
    * arXiv:2112.11446 §A1.1): fraction of duplicated words and duplicated
    * word-2-grams inside each document; heavily self-repeating documents
    * are boilerplate/spam and get `keep = false`. Pure per-row expression
    * work over the shared ShingleHash60 kernel — rides the scan, no
    * shuffle, 100 TB maps straight through.
    */
  def repetitionStats(s: SparkSession, d: String): DataFrame =
    Tables.documentsPar(s, d)
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("g2",
        graft.functions.PortableHashFunctions.shingleHash60(col("toks"), 2, Dedup.P))
      .select(col("doc_id"),
        size(col("toks")).cast("int").as("n_words"),
        (lit(1.0) - size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
          .as("dup_word_frac"),
        (lit(1.0) - size(array_distinct(col("g2"))).cast("double") / size(col("g2")))
          .as("dup_2gram_frac"))
      .withColumn("keep",
        col("dup_word_frac") < 0.7 && col("dup_2gram_frac") < 0.4)
      .orderBy(col("doc_id"))

  /** DuckDB twin of [[repetitionStats]] — same 2-gram hash spelling, same
    * double arithmetic, same thresholds.
    */
  val repetitionStatsSql: String =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
       |g AS (SELECT doc_id, toks,
       |        list_transform(generate_series(1, greatest(len(toks) - 1, 1)),
       |          i -> CAST(('0x' || substr(md5(array_to_string(toks[i:i+1], ' ')), 1, 15)) AS BIGINT) % ${Dedup.P}) AS g2
       |      FROM t)
       |SELECT doc_id, CAST(len(toks) AS INT) AS n_words,
       |       1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_word_frac,
       |       1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) AS dup_2gram_frac,
       |       (1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) < 0.7
       |         AND (1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)) < 0.4 AS keep
       |FROM g ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination (the n-gram-overlap scrub every serious
    * training pipeline runs before training — cf. Brown et al., "Language
    * Models are Few-Shot Learners", arXiv:2005.14165 §C): documents
    * sharing any word-5-gram with a held-out benchmark set are flagged.
    * Here the "benchmark" is the deterministic doc_id % 97 == 0 slice
    * standing in for an eval suite.
    *
    * Scale shape: the benchmark n-gram index is small (eval suites are
    * MBs, not TBs) and broadcasts; the corpus side is one scan + explode,
    * an inner join against the broadcast index, and a doc_id aggregation
    * of the few hits — no corpus-side shuffle beyond the hit set. At
    * 100 TB the same plan holds with the index distributed as a bloom
    * filter first if the eval suite ever outgrows broadcast range.
    */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val ngrams = Tables.documentsPar(s, d)
      .select(col("doc_id"),
        graft.functions.PortableHashFunctions.shingleHash60(
          split(lower(trim(col("text"))), "\\s+"), 5, Dedup.P).as("ng"))
    val bench = ngrams.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(explode(col("ng")).as("h")).distinct()
    val train = ngrams.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val hits = train.select(col("doc_id"), explode(col("ng")).as("h"))
      .join(broadcast(bench), Seq("h"))
      .groupBy(col("doc_id")).agg(countDistinct(col("h")).as("n_hits"))
    train.select(col("doc_id"), size(col("ng")).cast("int").as("n_ngrams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Data-mixture construction under a token budget: per source, rank
    * documents by a deterministic pseudo-random key (the same Knuth
    * multiplicative stride sampling uses) and keep documents while the
    * running token total stays under the per-source budget — how a
    * training run draws "N tokens of web, M tokens of code" from a far
    * larger corpus. One window per source (single hash shuffle on the
    * mixture key); the cumulative sum is streaming-friendly window state,
    * no per-source collect anywhere.
    */
  /** Shared prelude of [[tokenBudgetMix]] and [[sequencePack]]: each
    * document with its token count, deterministic mixture key (Knuth
    * multiplicative stride), and per-source cumulative token total —
    * defined ONCE so the two operators (and their oracles, via
    * [[cumTokensCtes]]) can never drift apart on the mixture order.
    */
  private def cumTokensBySource(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("rnd"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        expr(Formulas.nTokens).cast("long").as("n_tokens"),
        expr("pmod(pmod(doc_id, 1000000007L) * 2654435761L, 4294967296L)").as("rnd"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
  }

  /** DuckDB twin of [[cumTokensBySource]] as the `t`/`c` CTE pair. */
  private val cumTokensCtes: String =
    s"""t AS (SELECT doc_id, source,
       |        CAST(${Formulas.nTokensDuck} AS BIGINT) AS n_tokens,
       |        (doc_id % 1000000007) * 2654435761 % 4294967296 AS rnd
       |      FROM documents),
       |c AS (SELECT source, doc_id, n_tokens,
       |        CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY rnd, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |      FROM t)""".stripMargin

  def tokenBudgetMix(s: SparkSession, d: String, budget: Long = 2000): DataFrame =
    cumTokensBySource(s, d)
      .filter(col("cum_tokens") <= budget)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"))

  /** DuckDB twin of [[tokenBudgetMix]]. */
  def tokenBudgetMixSql(budget: Long = 2000): String =
    s"""WITH $cumTokensCtes
       |SELECT source, doc_id, n_tokens, cum_tokens FROM c
       |WHERE cum_tokens <= $budget ORDER BY source, cum_tokens""".stripMargin

  /** Temperature-based source mixing (the multilingual/Pile sampling
    * recipe, e.g. XLM-R's α-smoothed sampling, arXiv:1911.02116 §3.1):
    * per-source token budgets proportional to (source share)^α with
    * α = 0.5, which up-weights small sources relative to proportional
    * sampling; documents fill each budget in the deterministic mixture
    * order. All arbitration is INTEGER arithmetic both engines reproduce
    * bit-exactly: the only float op is IEEE sqrt, immediately scaled by a
    * power of two (exact) and floored into a BIGINT weight, so budget =
    * B·w_s/Σw never sits on an engine-dependent rounding boundary.
    *
    * Scale: one pass for per-source totals (a handful of rows), broadcast
    * back, one windowed cumulative pass — the same two-shuffle shape as
    * [[tokenBudgetMix]], 100 TB-safe.
    */
  def temperatureMix(s: SparkSession, d: String, budget: Long = 4000): DataFrame = {
    val cum = cumTokensBySource(s, d)
    val weights = cum.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tot_tokens"))
      .withColumn("w",
        floor(sqrt(col("tot_tokens").cast("double")) * lit(1048576.0)).cast("long"))
    val wsum = weights.agg(sum(col("w")).as("wsum"))
    val budgets = weights.crossJoin(broadcast(wsum))
      .select(col("source"), col("tot_tokens"),
        // explicit floor: a bare long cast truncates toward zero in Spark
        // but a double→BIGINT cast ROUNDS in DuckDB
        floor(lit(budget) * col("w") / col("wsum")).cast("long").as("src_budget"))
    cum.join(broadcast(budgets), Seq("source"))
      .filter(col("cum_tokens") <= col("src_budget"))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"),
        col("src_budget"))
      .orderBy(col("source"), col("cum_tokens"))
  }

  /** DuckDB twin of [[temperatureMix]] — same integer-weight spelling. */
  def temperatureMixSql(budget: Long = 4000): String =
    s"""WITH $cumTokensCtes,
       |wt AS (SELECT source, SUM(n_tokens) AS tot_tokens,
       |         CAST(floor(sqrt(CAST(SUM(n_tokens) AS DOUBLE)) * 1048576.0) AS BIGINT) AS w
       |       FROM c GROUP BY source),
       |b AS (SELECT source, CAST(floor($budget * w / (SELECT SUM(w) FROM wt)) AS BIGINT) AS src_budget
       |      FROM wt)
       |SELECT c.source, c.doc_id, c.n_tokens, c.cum_tokens, b.src_budget
       |FROM c JOIN b ON c.source = b.source
       |WHERE c.cum_tokens <= b.src_budget
       |ORDER BY c.source, c.cum_tokens""".stripMargin

  /** PII + blocklist scrubbing: redact emails, IPv4 addresses, and phone
    * numbers, then a configurable blocklist of canary/contamination terms
    * (the reference-benchmark-marker scrub every training pipeline runs).
    * Counts are taken on the progressively-redacted text, in the same
    * fixed order as the rewrites, so an email's digits are never double-
    * counted as a phone. Pure per-row regex expressions (Java regex and
    * DuckDB's RE2 agree on this common-subset syntax) — rides the scan,
    * no shuffle, 100 TB maps straight through.
    *
    * The synthetic corpus contains no real PII (those counts differential-
    * check the zero path); the blocklist terms DO occur, so the oracle
    * exercises live rewrites too. Planted-fixture behavior (real emails/
    * phones/IPs redacted byte-exactly) is covered in PipelineOpsSpec.
    */
  /** The ONE definition of the redaction pipeline: (count column, pattern
    * if applicable, replacement) in rewrite order — both the Spark plan
    * and the DuckDB oracle are generated from this list, so the two can
    * never disagree on order or patterns. A `None` pattern (empty
    * blocklist) contributes a constant-zero count and no rewrite.
    */
  private def piiSteps(blocklist: Seq[String]): Seq[(String, Option[String], String)] = Seq(
    ("n_emails", Some(Formulas.emailRe), "[EMAIL]"),
    ("n_ips", Some(Formulas.ipv4Re), "[IP]"),
    ("n_phones", Some(Formulas.phoneRe), "[PHONE]"),
    ("n_terms", Formulas.blockRe(blocklist), "[TERM]"))

  def piiRedact(s: SparkSession, d: String,
                blocklist: Seq[String] = Seq("spark", "stream")): DataFrame = {
    val steps = piiSteps(blocklist)
    val redacted = steps.foldLeft(
      Tables.documentsPar(s, d).select(col("doc_id"), col("text").as("clean"))) {
      case (df, (cnt, Some(pat), repl)) =>
        df.withColumn(cnt,
            size(regexp_extract_all(col("clean"), lit(pat), lit(0))).cast("int"))
          .withColumn("clean", regexp_replace(col("clean"), lit(pat), lit(repl)))
      case (df, (cnt, None, _)) => df.withColumn(cnt, lit(0))
    }
    redacted
      .select(col("doc_id") +: steps.map(st => col(st._1)) :+
        col("clean").as("clean_text"): _*)
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[piiRedact]] — identical pattern text (backslashes
    * pass through standard SQL literals untouched on DuckDB; the Spark
    * side avoids SQL-literal escaping entirely by passing patterns through
    * the column API), identical redaction order, 'g' flag for Spark's
    * replace-all default.
    */
  def piiRedactSql(blocklist: Seq[String] = Seq("spark", "stream")): String = {
    val steps = piiSteps(blocklist)
    // SQL single-quoted literal: only ' needs doubling (backslashes pass
    // through standard SQL strings verbatim on DuckDB)
    def q(pat: String): String = pat.replace("'", "''")
    val (ctes, _) = steps.zipWithIndex.foldLeft((Seq.empty[String], "text")) {
      case ((acc, prev), ((cnt, patOpt, repl), i)) =>
        val carried = if (i == 0) "" else s"${steps.take(i).map(_._1).mkString(", ")}, "
        val body = patOpt match {
          case Some(pat) =>
            s"""  CAST(len(regexp_extract_all($prev, '${q(pat)}')) AS INT) AS $cnt,
               |  regexp_replace($prev, '${q(pat)}', '$repl', 'g') AS c$i""".stripMargin
          case None =>
            s"""  CAST(0 AS INT) AS $cnt,
               |  $prev AS c$i""".stripMargin
        }
        val cte =
          s"""s$i AS (SELECT doc_id, $carried
             |$body
             |FROM ${if (i == 0) "documents" else s"s${i - 1}"})""".stripMargin
        (acc :+ cte, s"c$i")
    }
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT doc_id, ${steps.map(_._1).mkString(", ")}, c${steps.size - 1} AS clean_text
       |FROM s${steps.size - 1} ORDER BY doc_id""".stripMargin
  }

  /** Sequence packing (concat-and-chunk): order each source's documents by
    * the deterministic mixture key, run a cumulative token total, and
    * assign every document to training sequence `floor(start / seqLen)` —
    * the standard way a pre-training run packs variable-length documents
    * into fixed-length context windows. Emitted per-sequence (docs, token
    * total, fill ratio). One hash shuffle on `source` for the window, then
    * a map-side-combined aggregation on (source, seq_id) — the cumulative
    * sum never leaves the executor that owns the source partition.
    */
  def sequencePack(s: SparkSession, d: String, seqLen: Long = 512): DataFrame =
    cumTokensBySource(s, d)
      // a document starts at (cum - n); `div` truncates like DuckDB's `//`
      // for these non-negative operands
      .withColumn("seq_id", expr(s"(cum_tokens - n_tokens) div $seqLen"))
      .groupBy(col("source"), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        (sum(col("n_tokens")).cast("double") / lit(seqLen.toDouble)).as("fill_ratio"))
      .orderBy(col("source"), col("seq_id"))

  /** DuckDB twin of [[sequencePack]]. */
  def sequencePackSql(seqLen: Long = 512): String =
    s"""WITH $cumTokensCtes
       |SELECT source, CAST((cum_tokens - n_tokens) // $seqLen AS BIGINT) AS seq_id,
       |       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       |       CAST(SUM(n_tokens) AS DOUBLE) / $seqLen AS fill_ratio
       |FROM c GROUP BY source, seq_id ORDER BY source, seq_id""".stripMargin

  /** Overlapping-window document chunking — the context-window
    * preprocessing every RAG index and long-document training pipeline
    * runs: each document explodes into windows of `chunkLen` whitespace
    * tokens starting every `stride` tokens (overlap = chunkLen − stride),
    * the final window clamping at the document end. Pure per-row explode:
    * rides the scan, output partitions inherit the input's, no shuffle
    * until the caller aggregates.
    */
  def chunkDocsOf(docs: DataFrame, chunkLen: Int = 32, stride: Int = 24): DataFrame =
    docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, greatest(size(toks) - 1, 0), $stride)")).as("start"))
      .select(
        col("doc_id"),
        expr(s"start div $stride").as("chunk_id"),
        size(expr(s"slice(toks, start + 1, $chunkLen)")).cast("int").as("n_chunk_tokens"),
        concat_ws(" ", expr(s"slice(toks, start + 1, $chunkLen)")).as("chunk_text"))

  def chunkDocs(s: SparkSession, d: String,
                chunkLen: Int = 32, stride: Int = 24): DataFrame =
    chunkDocsOf(Tables.documents(s, d), chunkLen, stride)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** DuckDB twin of [[chunkDocs]] — 1-based inclusive list slices equal
    * Spark's (start, length) slices element-for-element.
    */
  def chunkDocsSql(chunkLen: Int = 32, stride: Int = 24): String =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |           FROM documents),
       |x AS (SELECT doc_id, toks,
       |        unnest(generate_series(0, greatest(len(toks) - 1, 0), $stride)) AS start
       |      FROM t)
       |SELECT doc_id, CAST(start // $stride AS BIGINT) AS chunk_id,
       |       CAST(len(toks[start + 1 : start + $chunkLen]) AS INT) AS n_chunk_tokens,
       |       array_to_string(toks[start + 1 : start + $chunkLen], ' ') AS chunk_text
       |FROM x ORDER BY doc_id, chunk_id""".stripMargin

  /** Text normalization — the first stage of every cleaning pipeline:
    * lowercase, control characters to spaces, whitespace runs collapsed,
    * ends trimmed. Pure per-row regex/codegen expressions (Java-regex/RE2
    * common subset, like [[piiRedact]]).
    */
  def normalizeTextOf(docs: DataFrame): DataFrame = {
    val ctl = "[\\x00-\\x1f\\x7f]"
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), lit(ctl), lit(" ")),
      lit("""\s+"""), lit(" ")))
    docs.select(col("doc_id"), norm.as("norm_text"),
      (norm =!= col("text")).as("changed"))
  }

  def normalizeText(s: SparkSession, d: String): DataFrame =
    normalizeTextOf(Tables.documents(s, d)).orderBy(col("doc_id"))

  /** DuckDB twin of [[normalizeText]]. */
  val normalizeTextSql: String =
    """SELECT doc_id,
      |       trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1f\x7f]', ' ', 'g'),
      |                           '\s+', ' ', 'g')) AS norm_text,
      |       trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1f\x7f]', ' ', 'g'),
      |                           '\s+', ' ', 'g')) <> text AS changed
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Token-length band filter: keep each source's documents whose token
    * count falls inside the exact p10–p90 rank band — the tails-trimming
    * quality filter (too-short fragments, too-long concatenation
    * artifacts), spelled with integer ranks so both engines agree exactly
    * (percentile interpolation differs across engines; rank selection
    * does not — same rule as the exact median). One shuffle on `source`
    * for the two windows, then a pure filter. Scale note: an exact
    * per-source rank is inherently a per-source sort — on a corpus where
    * one source dominates, the production path is approx_percentile
    * thresholds (ApproxSpec shows the bounds) with this exact spelling as
    * the verification oracle.
    */
  def lengthBandFilter(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("n_tokens"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        expr(Formulas.nTokens).cast("long").as("n_tokens"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("source"))).cast("long"))
      .filter(col("rk") > expr("cnt div 10") &&
        col("rk") <= col("cnt") - expr("cnt div 10"))
      .select(col("source"), col("doc_id"), col("n_tokens"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** DuckDB twin of [[lengthBandFilter]] — `div`/`//` agree on the
    * non-negative counts here.
    */
  val lengthBandFilterSql: String =
    s"""WITH t AS (SELECT doc_id, source,
       |             CAST(${Formulas.nTokensDuck} AS BIGINT) AS n_tokens
       |           FROM documents),
       |r AS (SELECT doc_id, source, n_tokens,
       |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rk,
       |        COUNT(*) OVER (PARTITION BY source) AS cnt
       |      FROM t)
       |SELECT source, doc_id, n_tokens FROM r
       |WHERE rk > cnt // 10 AND rk <= cnt - cnt // 10
       |ORDER BY source, doc_id""".stripMargin

  /** Per-source data card — the dataset datasheet a training run reads
    * before mixing sources: document and token counts, exact-duplicate
    * rate, language spread, and mean document length (decimal-exact mean,
    * then one double division). One map-side-combined aggregation over
    * the corpus; the duplicate count DISTINCTs the portable 60-bit
    * content hash (same as [[Dedup.dedupByFingerprint]]'s rationale), so
    * only 8-byte keys reach the distinct shuffle — a `DISTINCT text`
    * would move every document body.
    */
  def sourceDataCard(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), col("lang"),
        expr(Dedup.Portable.spark60("text")).as("fp"),
        expr(Formulas.nTokens).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_docs"),
        countDistinct(col("lang")).as("n_langs"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("mean_tokens"))
      .orderBy(col("source"))

  /** DuckDB twin of [[sourceDataCard]]. */
  val sourceDataCardSql: String =
    s"""WITH t AS (SELECT source, lang,
       |             ${Dedup.Portable.duck60("text")} AS fp,
       |             CAST(${Formulas.nTokensDuck} AS BIGINT) AS n_tokens
       |           FROM documents)
       |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dup_docs,
       |       COUNT(DISTINCT lang) AS n_langs,
       |       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens
       |FROM t GROUP BY source ORDER BY source""".stripMargin

  /** Vocabulary coverage: build the top-V corpus vocabulary by frequency
    * (count desc, word asc — deterministic ties) and report each
    * document's out-of-vocabulary token count/ratio — the signal used to
    * size tokenizer vocabularies and to spot domain-shifted documents.
    * Shape: one token-count shuffle, a tiny top-V that BROADCASTS back
    * onto the token stream (the corpus is never re-shuffled), then a
    * per-document aggregation — each phase's shuffle key is either a word
    * or a doc id, never the corpus payload; holds at 100 TB.
    */
  def vocabCoverage(s: SparkSession, d: String, vocabSize: Int = 32): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ratio",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[vocabCoverage]]. */
  def vocabCoverageSql(vocabSize: Int = 32): String =
    s"""WITH toks AS (SELECT doc_id,
       |                unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
       |              FROM documents),
       |vocab AS (SELECT w FROM (SELECT w, COUNT(*) AS c FROM toks GROUP BY w
       |                         ORDER BY c DESC, w LIMIT $vocabSize) t)
       |SELECT t.doc_id, COUNT(*) AS n_tokens,
       |       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(COUNT(*) AS DOUBLE) AS oov_ratio
       |FROM toks t LEFT JOIN vocab v ON t.w = v.w
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** DuckDB twin of [[decontaminate]] — same 5-gram spelling, same
    * benchmark slice, same left-join/COALESCE shape.
    */
  val decontaminateSql: String =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
       |ngr AS (SELECT doc_id,
       |          list_transform(generate_series(1, greatest(len(toks) - 4, 1)),
       |            i -> CAST(('0x' || substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15)) AS BIGINT) % ${Dedup.P}) AS ng
       |        FROM t),
       |bench AS (SELECT DISTINCT unnest(ng) AS h FROM ngr WHERE doc_id % 97 = 0),
       |train AS (SELECT doc_id, ng FROM ngr WHERE doc_id % 97 <> 0),
       |hits AS (SELECT u.doc_id, count(DISTINCT u.h) AS n_hits
       |         FROM (SELECT doc_id, unnest(ng) AS h FROM train) u
       |         JOIN bench b ON u.h = b.h GROUP BY u.doc_id)
       |SELECT tr.doc_id, CAST(len(tr.ng) AS INT) AS n_ngrams,
       |       COALESCE(h.n_hits, 0) AS n_hits,
       |       COALESCE(h.n_hits, 0) > 0 AS contaminated
       |FROM train tr LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""".stripMargin

  /** The COMPOSED preprocessing pipeline — normalize → quality-filter →
    * exact-dedup (portable hash of the NORMALIZED text, keep-min per
    * source) → token accounting → 512-token packing estimate, per source,
    * in one query. Each stage is the same logic as its standalone
    * operator; the point is that the whole corpus pipeline is one
    * declarative plan: Catalyst fuses the per-row stages into the scan
    * (normalize/score/hash are one codegen stage), and only two shuffles
    * remain — the (source, hash) dedup groupBy and the per-source rollup.
    * At 100 TB that plan shape is the whole story: no intermediate
    * materialization between stages, no driver round-trips.
    */
  def corpusPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("text"))
    val norm = docs.withColumn("norm_text",
      trim(regexp_replace(
        regexp_replace(lower(col("text")), lit("[\\x00-\\x1f\\x7f]"), lit(" ")),
        lit("""\s+"""), lit(" "))))
    val scored = norm
      .withColumn("n_tokens",
        when(length(col("norm_text")) === 0, lit(0))
          .otherwise(size(split(col("norm_text"), "\\s+"))).cast("double"))
      .withColumn("n_uniq",
        size(array_distinct(split(col("norm_text"), "\\s+"))).cast("double"))
      .withColumn("punct_ratio",
        length(regexp_replace(col("norm_text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
          length(col("norm_text")).cast("double"))
    val kept = scored.filter(
      col("n_tokens") >= 5 &&
        (col("n_uniq") / col("n_tokens")) > 0.1 &&
        col("punct_ratio") < 0.3)
    val groups = kept
      .withColumn("h", expr(Dedup.Portable.spark60("norm_text")))
      .groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("grp"),
        // all rows in a hash group share norm_text, hence token count;
        // min is just the deterministic pick
        min(col("n_tokens")).cast("long").as("tok"))
    val perSrc = groups.groupBy(col("source"))
      .agg(count(lit(1)).as("docs_kept"),
        (sum(col("grp")) - count(lit(1))).cast("long").as("dups_removed"),
        sum(col("tok")).cast("long").as("total_tokens"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("docs_in"))
      .join(perSrc, Seq("source"), "left")
      .select(col("source"), col("docs_in"),
        coalesce(col("docs_kept"), lit(0L)).as("docs_kept"),
        coalesce(col("dups_removed"), lit(0L)).as("dups_removed"),
        coalesce(col("total_tokens"), lit(0L)).as("total_tokens"))
      .withColumn("n_seqs", expr("(total_tokens + 511) div 512"))
      .orderBy(col("source"))
  }

  /** DuckDB twin of [[corpusPipeline]] — the same five stages as CTEs.
    * Ratio comparisons are double-vs-double on BOTH engines (DuckDB's
    * `* 1.0` would be DECIMAL arithmetic with different rounding at the
    * keep/drop thresholds).
    */
  val corpusPipelineSql: String =
    s"""WITH norm AS (SELECT doc_id, source,
       |  trim(regexp_replace(regexp_replace(lower(text), '[\\x00-\\x1f\\x7f]', ' ', 'g'),
       |                      '\\s+', ' ', 'g')) AS norm_text FROM documents),
       |scored AS (SELECT doc_id, source, norm_text,
       |  CASE WHEN length(norm_text) = 0 THEN 0
       |       ELSE len(regexp_split_to_array(norm_text, '\\s+')) END AS n_tokens,
       |  len(list_distinct(regexp_split_to_array(norm_text, '\\s+'))) AS n_uniq,
       |  CAST(length(regexp_replace(norm_text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
       |    / length(norm_text) AS punct_ratio
       |  FROM norm),
       |kept AS (SELECT * FROM scored
       |  WHERE n_tokens >= 5 AND CAST(n_uniq AS DOUBLE) / n_tokens > 0.1
       |    AND punct_ratio < 0.3),
       |groups AS (SELECT source, ${Dedup.Portable.duck60("norm_text")} AS h,
       |  COUNT(*) AS grp, MIN(n_tokens) AS tok FROM kept GROUP BY 1, 2),
       |per_src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_kept,
       |  CAST(SUM(grp) - COUNT(*) AS BIGINT) AS dups_removed,
       |  CAST(SUM(tok) AS BIGINT) AS total_tokens FROM groups GROUP BY 1),
       |input AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_in
       |  FROM documents GROUP BY 1)
       |SELECT i.source, i.docs_in,
       |       COALESCE(p.docs_kept, 0) AS docs_kept,
       |       COALESCE(p.dups_removed, 0) AS dups_removed,
       |       COALESCE(p.total_tokens, 0) AS total_tokens,
       |       CAST((COALESCE(p.total_tokens, 0) + 511) // 512 AS BIGINT) AS n_seqs
       |FROM input i LEFT JOIN per_src p USING (source) ORDER BY i.source""".stripMargin
}
