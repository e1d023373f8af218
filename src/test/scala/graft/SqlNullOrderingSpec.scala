package graft

import graft.params.SqlStatement

/** Trino NULL-ordering parity on the SQL surface: "The default null
  * ordering is NULLS LAST, regardless of the ordering direction" (Trino
  * docs; DuckDB agrees), while Spark defaults to NULLS FIRST on ASC.
  * The engine appends Trino's default to every ORDER BY item
  * lacking an explicit NULLS clause (reference stack behavior —
  * trino.io/docs/current/sql/select.html#order-by-clause), so a nullable
  * sort key orders the way the reference would, while explicit NULLS
  * clauses pass through untouched. One NULL row per fixture unless a
  * later item breaks the tie — relative order WITHIN the null block is
  * unspecified on both engines.
  */
class SqlNullOrderingSpec extends SparkSpec {
  import spark.implicits._

  private def engine(name: String, rows: String): GraftEngine = {
    val e = new GraftEngine(spark, tmpDir(name))
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.t (id bigint, k bigint)"))
    e.executeNonQuery(SqlStatement(s"INSERT INTO demo.t VALUES $rows"))
    e
  }
  private val oneNull = "(1, 10), (2, NULL), (3, 5)"

  private def ids(e: GraftEngine, sql: String): Seq[Long] =
    e.query(SqlStatement(sql)).select("id").as[Long].collect().toSeq

  test("bare ORDER BY: NULLs sort last in BOTH directions (Trino default)") {
    val e = engine("nullord-bare", oneNull)
    assert(ids(e, "SELECT id FROM demo.t ORDER BY k") === Seq(3L, 1L, 2L))
    assert(ids(e, "SELECT id FROM demo.t ORDER BY k ASC") === Seq(3L, 1L, 2L))
    assert(ids(e, "SELECT id FROM demo.t ORDER BY k DESC") === Seq(1L, 3L, 2L))
    // explicit NULLS clauses are the user's choice — untouched
    assert(ids(e, "SELECT id FROM demo.t ORDER BY k NULLS FIRST") === Seq(2L, 3L, 1L))
    assert(ids(e, "SELECT id FROM demo.t ORDER BY k DESC NULLS FIRST") === Seq(2L, 1L, 3L))
  }

  test("clause boundaries: LIMIT, multiple items, subqueries, semicolons") {
    val e = engine("nullord-bounds", oneNull)
    assert(ids(e, "SELECT id FROM demo.t ORDER BY k LIMIT 2") === Seq(3L, 1L))
    assert(ids(e, "SELECT id FROM demo.t ORDER BY k DESC LIMIT 2") === Seq(1L, 3L))
    // an inner ORDER BY gets its own rewrite (nulls-last keeps the two
    // non-null rows in the LIMIT); the outer one too
    assert(ids(e,
      """SELECT id FROM (SELECT id, k FROM demo.t ORDER BY k LIMIT 2) x
        |ORDER BY k DESC""".stripMargin) === Seq(1L, 3L))
    assert(ids(e, "SELECT id FROM demo.t ORDER BY k;") === Seq(3L, 1L, 2L))
    // two NULL rows: the second item breaks the tie inside the null block
    val e2 = engine("nullord-multi", "(1, 10), (2, NULL), (3, 5), (4, NULL)")
    assert(ids(e2, "SELECT id FROM demo.t ORDER BY k, id DESC") ===
      Seq(3L, 1L, 4L, 2L))
  }

  test("window ORDER BY follows the same defaults; frames still parse") {
    val e = engine("nullord-win", oneNull)
    // rank by k ascending: the NULL row ranks LAST (Trino), not first (Spark)
    val r = e.query(SqlStatement(
      """SELECT id, row_number() OVER (ORDER BY k) AS rn FROM demo.t"""))
      .orderBy("rn").select("id").as[Long].collect().toSeq
    assert(r === Seq(3L, 1L, 2L))
    // a frame's ROWS keyword terminates the item scan
    val s = e.query(SqlStatement(
      """SELECT id, sum(coalesce(k, 0)) OVER
        |  (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |FROM demo.t""".stripMargin))
      .orderBy("id").select("c").as[Long].collect().toSeq
    assert(s === Seq(15L, 15L, 5L)) // nulls last: 5, 15, then the null row
  }

  test("textual pass leaves literals alone and handles odd spellings") {
    val e = engine("nullord-text", oneNull)
    // 'ORDER BY' inside a string literal must not rewrite
    assert(e.rewriteNullOrdering("SELECT 'ORDER BY x' AS s FROM demo.t") ===
      "SELECT 'ORDER BY x' AS s FROM demo.t")
    assert(e.rewriteNullOrdering("SELECT id FROM demo.t ORDER BY k") ===
      "SELECT id FROM demo.t ORDER BY k NULLS LAST")
    assert(e.rewriteNullOrdering("SELECT id FROM demo.t ORDER BY k DESC, id") ===
      "SELECT id FROM demo.t ORDER BY k DESC NULLS LAST, id NULLS LAST")
    assert(e.rewriteNullOrdering(
      "SELECT id FROM demo.t ORDER BY coalesce(k, id) DESC LIMIT 1") ===
      "SELECT id FROM demo.t ORDER BY coalesce(k, id) DESC NULLS LAST LIMIT 1")
    // already-explicit NULLS: untouched
    assert(e.rewriteNullOrdering("SELECT id FROM demo.t ORDER BY k NULLS FIRST") ===
      "SELECT id FROM demo.t ORDER BY k NULLS FIRST")
    // UNION branch terminator
    assert(e.rewriteNullOrdering(
      "(SELECT id FROM demo.t ORDER BY id LIMIT 1) UNION ALL (SELECT id FROM demo.t)") ===
      "(SELECT id FROM demo.t ORDER BY id NULLS LAST LIMIT 1) UNION ALL (SELECT id FROM demo.t)")
    // a column literally NAMED like a terminator is the item itself
    // when it opens the clause — it still rewrites (round-11 advice)
    assert(e.rewriteNullOrdering("SELECT id FROM t ORDER BY rows") ===
      "SELECT id FROM t ORDER BY rows NULLS LAST")
    assert(e.rewriteNullOrdering("SELECT id FROM t ORDER BY range DESC, x LIMIT 2") ===
      "SELECT id FROM t ORDER BY range DESC NULLS LAST, x NULLS LAST LIMIT 2")
    // ... but as a SECOND token it terminates as before (window frame)
    assert(e.rewriteNullOrdering("SELECT sum(v) OVER (ORDER BY k ROWS 2 PRECEDING) FROM t") ===
      "SELECT sum(v) OVER (ORDER BY k NULLS LAST ROWS 2 PRECEDING) FROM t")
    // 'ORDER BY' inside a double-quoted identifier must not rewrite
    assert(e.rewriteNullOrdering("""SELECT "order by weird" FROM t""") ===
      """SELECT "order by weird" FROM t""")
    assert(e.rewriteNullOrdering("SELECT `order by weird` FROM t") ===
      "SELECT `order by weird` FROM t")
  }
}
