package graft

import graft.params.SqlStatement
import org.apache.spark.sql.DataFrame

/** Incremental REFRESH MATERIALIZED VIEW: when every source commit since
  * the last refresh is append-only and the definition is a mergeable
  * shape, the refresh replays the definition over ONLY the appended rows
  * ([[SnapshotCatalog.appendsBetween]]) — a select-project-filter view
  * lands the delta as one APPEND commit, an aggregate view re-aggregates
  * `materialized ∪ delta-partial`; everything else falls back to the full
  * recompute transparently (same SQL surface either way). Each case also
  * pins the ground truth: post-refresh MV state equals the definition
  * recomputed from scratch.
  */
class MvIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine(name: String): GraftEngine = {
    val e = new GraftEngine(spark, tmpDir(name))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.src (id bigint, grp varchar, v bigint)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 30)"))
    e
  }

  private def rows(e: GraftEngine, sql: String): Seq[Seq[Any]] =
    e.query(SqlStatement(sql)).collect().toSeq.map(_.toSeq)

  /** MV content must equal the definition recomputed over the CURRENT
    * source — the invariant every incremental strategy must preserve.
    */
  private def assertMatchesRecompute(e: GraftEngine, mv: String,
                                     defSql: String, orderCol: String): Unit = {
    val got = rows(e, s"SELECT * FROM demo.$mv ORDER BY $orderCol")
    val want = e.query(SqlStatement(defSql))
      .orderBy(orderCol).collect().toSeq.map(_.toSeq)
    assert(got === want)
  }

  test("aggregate MV merges partials: count/sum/min/max, existing + new groups") {
    val e = freshEngine("mvi-agg")
    val defSql = """SELECT grp, count(*) AS n, sum(v) AS total,
                   |       min(v) AS lo, max(v) AS hi
                   |FROM demo.src GROUP BY grp""".stripMargin
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mv AS $defSql"))
    // two append commits between refreshes: grow group a, add group c
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (4, 'a', 5)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (5, 'c', 50), (6, 'c', 7)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mv"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assert(rows(e, "SELECT grp, n, total, lo, hi FROM demo.mv ORDER BY grp") ===
      Seq(Seq("a", 3L, 35L, 5L, 20L), Seq("b", 1L, 30L, 30L, 30L),
          Seq("c", 2L, 57L, 7L, 50L)))
    assertMatchesRecompute(e, "mv", defSql, "grp")
    assert(e.catalog.staleSources("demo", "mv").isEmpty)
  }

  test("select-project-filter MV refreshes as ONE append commit of the delta") {
    val e = freshEngine("mvi-spj")
    val defSql = "SELECT id, grp, v * 2 AS v2 FROM demo.src WHERE v > 5"
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvp AS $defSql"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (4, 'c', 40), (5, 'c', 1)")) // 5 filtered out
    val refreshed = e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvp"))
    assert(e.lastMvRefreshMode === "incremental-append")
    assert(refreshed === 4L) // 3 original + 1 surviving delta row
    assertMatchesRecompute(e, "mvp", defSql, "id")
    // observable in history: the refresh is an append, not a replace
    val ops = e.query(SqlStatement(
      """SELECT operation FROM demo."mvp$snapshots" ORDER BY snapshot_id"""))
      .as[String].collect().toSeq
    assert(ops === Seq("append", "append"))
  }

  test("global aggregate (no GROUP BY) merges; second refresh is a noop") {
    val e = freshEngine("mvi-global")
    val defSql = "SELECT count(*) AS n, sum(v) AS total, max(v) AS hi FROM demo.src"
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvg AS $defSql"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (4, 'b', 99)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvg"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assert(rows(e, "SELECT n, total, hi FROM demo.mvg") === Seq(Seq(4L, 159L, 99L)))
    // fresh MV: refresh commits nothing, reports the current row count
    val before = e.catalog.snapshots("demo", "mvg").size
    assert(e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvg")) === 1L)
    assert(e.lastMvRefreshMode === "noop")
    assert(e.catalog.snapshots("demo", "mvg").size === before)
  }

  test("all-keys aggregate (GROUP BY with no measures) merges as DISTINCT") {
    val e = freshEngine("mvi-keys")
    e.executeNonQuery(SqlStatement(
      "CREATE MATERIALIZED VIEW demo.mvd AS SELECT grp FROM demo.src GROUP BY grp"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (4, 'a', 1), (5, 'z', 2)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvd"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assert(rows(e, "SELECT grp FROM demo.mvd ORDER BY grp") ===
      Seq(Seq("a"), Seq("b"), Seq("z")))
  }

  test("GROUP BY ordinal classifies; delta replay honors the WHERE filter") {
    val e = freshEngine("mvi-ordinal")
    val defSql =
      "SELECT grp, sum(v) AS total FROM demo.src WHERE v < 25 GROUP BY 1"
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvo AS $defSql"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (4, 'a', 2), (5, 'a', 1000)")) // 1000 filtered
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvo"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assert(rows(e, "SELECT grp, total FROM demo.mvo ORDER BY grp") ===
      Seq(Seq("a", 32L)))
    assertMatchesRecompute(e, "mvo", defSql, "grp")
  }

  test("non-append source commits fall back to full recompute — still exact") {
    val e = freshEngine("mvi-fallback-dml")
    val defSql = "SELECT grp, count(*) AS n FROM demo.src GROUP BY grp"
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvf AS $defSql"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (4, 'b', 40)"))
    e.executeNonQuery(SqlStatement("DELETE FROM demo.src WHERE id = 1")) // rewrite
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvf"))
    assert(e.lastMvRefreshMode === "full")
    assert(rows(e, "SELECT grp, n FROM demo.mvf ORDER BY grp") ===
      Seq(Seq("a", 1L), Seq("b", 2L)))
  }

  test("ineligible definitions recompute: outer join, DISTINCT, self-join, window") {
    val e = freshEngine("mvi-ineligible")
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.dim (grp varchar, label varchar)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES ('a', 'alpha'), ('b', 'beta')"))
    val defs = Seq(
      // outer join: a later dim row would RETRACT the unmatched-NULL row —
      // not expressible as an append, must recompute
      "oj" -> """SELECT s.id, d.label FROM demo.src s
                |LEFT JOIN demo.dim d ON s.grp = d.grp""".stripMargin,
      "dist" -> "SELECT grp, count(DISTINCT v) AS n FROM demo.src GROUP BY grp",
      "self" -> """SELECT a.grp, count(*) AS n FROM demo.src a
                  |JOIN demo.src b ON a.id = b.id GROUP BY a.grp""".stripMargin,
      "win" -> """SELECT id, sum(v) OVER (PARTITION BY grp ORDER BY id) AS r
                 |FROM demo.src""".stripMargin)
    for ((name, d) <- defs)
      e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mv_$name AS $d"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (7, 'a', 70)"))
    for ((name, d) <- defs) {
      e.executeNonQuery(SqlStatement(s"REFRESH MATERIALIZED VIEW demo.mv_$name"))
      assert(e.lastMvRefreshMode === "full", s"mv_$name should recompute")
      val got = e.query(SqlStatement(s"SELECT * FROM demo.mv_$name")).collect().toSet
      val want = e.query(SqlStatement(d)).collect().toSet
      assert(got === want, s"mv_$name content")
    }
  }

  test("join MV: fact appends replay as one delta⋈dim leg (incremental-merge)") {
    val e = freshEngine("mvi-join-fact")
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.dim (grp varchar, label varchar)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.dim VALUES ('a', 'alpha'), ('b', 'beta'), ('c', 'gamma')"))
    val defSql = """SELECT d.label AS label, count(*) AS n, sum(s.v) AS sv
                   |FROM demo.src s JOIN demo.dim d ON s.grp = d.grp
                   |GROUP BY d.label""".stripMargin
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvj AS $defSql"))
    // only the fact moves: the dim delta is empty, so the A_old leg—the
    // one that would re-scan the fact—must not be needed
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (4, 'a', 40), (5, 'c', 50)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvj"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assert(rows(e, "SELECT label, n, sv FROM demo.mvj ORDER BY label") ===
      Seq(Seq("alpha", 3L, 70L), Seq("beta", 1L, 30L), Seq("gamma", 1L, 50L)))
    assertMatchesRecompute(e, "mvj", defSql, "label")
  }

  test("join MV: both sources move — ΔA⋈B_new ∪ A_old⋈ΔB lands exactly") {
    val e = freshEngine("mvi-join-both")
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.dim (grp varchar, label varchar)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES ('a', 'alpha')"))
    val defSql = """SELECT s.id, d.label, s.v FROM demo.src s
                   |JOIN demo.dim d ON s.grp = d.grp WHERE s.v > 5""".stripMargin
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvjb AS $defSql"))
    // fact gains an 'a' and a 'b' row; dim gains 'b' — the new dim row
    // must pick up BOTH the old b-rows (id 3) and the new one (id 5)
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (4, 'a', 44), (5, 'b', 55)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES ('b', 'beta')"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvjb"))
    assert(e.lastMvRefreshMode === "incremental-append")
    assert(rows(e, "SELECT id, label, v FROM demo.mvjb ORDER BY id") ===
      Seq(Seq(1L, "alpha", 10L), Seq(2L, "alpha", 20L), Seq(3L, "beta", 30L),
          Seq(4L, "alpha", 44L), Seq(5L, "beta", 55L)))
    assertMatchesRecompute(e, "mvjb", defSql, "id")
    // a refresh with neither source moved noops
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvjb"))
    assert(e.lastMvRefreshMode === "noop")
  }

  test("star MV (fact⋈dim1⋈dim2): every move pattern lands the telescoped legs exactly") {
    val e = freshEngine("mvi-star")
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.dim (grp varchar, label varchar)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.dim VALUES ('a', 'alpha'), ('b', 'beta')"))
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.dim2 (id bigint, tag varchar)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.dim2 VALUES (1, 'one'), (2, 'two'), (3, 'three')"))
    val defSql = """SELECT d.label AS label, d2.tag AS tag,
                   |       count(*) AS n, sum(s.v) AS sv
                   |FROM demo.src s
                   |JOIN demo.dim d ON s.grp = d.grp
                   |JOIN demo.dim2 d2 ON s.id = d2.id
                   |GROUP BY d.label, d2.tag""".stripMargin
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvs AS $defSql"))
    def matchesRecompute(): Unit = {
      val got = rows(e, "SELECT * FROM demo.mvs").map(_.toString).sorted
      val want = e.query(SqlStatement(defSql)).collect().toSeq
        .map(_.toSeq.toString).sorted
      assert(got === want)
    }
    // fact-only move: one Δfact ⋈ dim1_new ⋈ dim2_new leg
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (2, 'b', 7)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvs"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    matchesRecompute()
    // ALL THREE move in one refresh window: Δs⋈d_new⋈d2_new ∪
    // s_old⋈Δd⋈d2_new ∪ s_old⋈d_old⋈Δd2 — the new dim rows must pick up
    // old fact rows, the new dim2 row must see old fact+dim pairs
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (4, 'c', 40)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES ('c', 'gamma')"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim2 VALUES (4, 'four')"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvs"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    matchesRecompute()
    // dim-only move after the fact settled: two legs with empty fact Δ
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim2 VALUES (99, 'none')"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvs"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    matchesRecompute()
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvs"))
    assert(e.lastMvRefreshMode === "noop")
    // a non-append commit on ANY of the three recomputes — still exact
    e.executeNonQuery(SqlStatement("DELETE FROM demo.dim2 WHERE id = 99"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (3, 'a', 9)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvs"))
    assert(e.lastMvRefreshMode === "full")
    matchesRecompute()
  }

  test("star MV: select-project-filter over three sources appends the telescoped delta") {
    val e = freshEngine("mvi-star-proj")
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.dim (grp varchar, label varchar)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES ('a', 'alpha'), ('b', 'beta')"))
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.dim2 (id bigint, tag varchar)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.dim2 VALUES (1, 'one'), (2, 'two'), (3, 'three'), (4, 'four')"))
    val defSql = """SELECT s.id, d.label, d2.tag, s.v FROM demo.src s
                   |JOIN demo.dim d ON s.grp = d.grp
                   |JOIN demo.dim2 d2 ON s.id = d2.id
                   |WHERE s.v > 5""".stripMargin
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvsp AS $defSql"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (4, 'b', 44)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES ('c', 'gamma')"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvsp"))
    assert(e.lastMvRefreshMode === "incremental-append")
    assertMatchesRecompute(e, "mvsp", defSql, "id")
  }

  test("join MV: a non-append commit on EITHER source recomputes — still exact") {
    val e = freshEngine("mvi-join-fallback")
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.dim (grp varchar, label varchar)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES ('a', 'alpha'), ('b', 'beta')"))
    val defSql = """SELECT d.label AS label, sum(s.v) AS sv FROM demo.src s
                   |JOIN demo.dim d ON s.grp = d.grp GROUP BY d.label""".stripMargin
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvjf AS $defSql"))
    e.executeNonQuery(SqlStatement("UPDATE demo.dim SET label = 'ALPHA' WHERE grp = 'a'"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvjf"))
    assert(e.lastMvRefreshMode === "full")
    assert(rows(e, "SELECT label, sv FROM demo.mvjf ORDER BY label") ===
      Seq(Seq("ALPHA", 30L), Seq("beta", 30L)))
  }

  test("FILTER-clause measures merge incrementally (the replay applies the filter)") {
    val e = freshEngine("mvi-filter")
    val defSql = """SELECT grp, count(*) FILTER (WHERE v >= 20) AS big_n,
                   |       sum(v) FILTER (WHERE v < 20) AS small_sum,
                   |       max(v) FILTER (WHERE v % 2 = 0) AS even_max
                   |FROM demo.src GROUP BY grp""".stripMargin
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvflt AS $defSql"))
    // deltas hitting each filter differently: rows matching none/some/all
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (4, 'a', 3), (5, 'b', 21), (6, 'c', 8)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvflt"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assertMatchesRecompute(e, "mvflt", defSql, "grp")
    // a DISTINCT measure stays ineligible even with the filter admitted
    assert(MvIncremental.classify(e.spark,
      "SELECT grp, count(DISTINCT v) AS n FROM demo.src GROUP BY grp",
      Set(("demo", "src")), "default") === None)
  }

  test("avg measures merge through hidden sum/count partials, concealed on reads") {
    val e = freshEngine("mvi-avg")
    val defSql = """SELECT grp, avg(v) AS m, count(*) AS n,
                   |       avg(v) FILTER (WHERE v >= 20) AS big_m
                   |FROM demo.src GROUP BY grp""".stripMargin
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvavg AS $defSql"))
    // the stored table carries the hidden partials; the engine hides them
    assert(e.catalog.declaredSchema("demo", "mvavg").get.fieldNames
      .count(_.startsWith("__mv_")) === 4)
    assert(e.query(SqlStatement("SELECT * FROM demo.mvavg")).columns.toSeq ===
      Seq("grp", "m", "n", "big_m"))
    // deltas: grow group a (shifting its mean), add group c, all-filtered
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (4, 'a', 7)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (5, 'c', 50), (6, 'c', 5), (7, 'b', 1)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvavg"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assertMatchesRecompute(e, "mvavg", defSql, "grp")
    // a second wave keeps merging (partials accumulated, not recomputed)
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (8, 'a', 100)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvavg"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assertMatchesRecompute(e, "mvavg", defSql, "grp")
    // DESCRIBE hides the partials and reports the merge strategy
    val desc = e.query(SqlStatement("DESCRIBE demo.mvavg")).collect()
    assert(!desc.exists(_.getString(0).startsWith("__mv_")))
    assert(desc.exists(r => r.getString(0) == "# refresh_strategy" &&
      r.getString(1) == "incremental-merge"))
    // a non-append commit still recomputes and REBUILDS the partials,
    // after which incremental merging resumes
    e.executeNonQuery(SqlStatement("DELETE FROM demo.src WHERE id = 4"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvavg"))
    assert(e.lastMvRefreshMode === "full")
    assertMatchesRecompute(e, "mvavg", defSql, "grp")
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (9, 'b', 13)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvavg"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assertMatchesRecompute(e, "mvavg", defSql, "grp")
  }

  test("avg over a join MV merges incrementally; global avg too") {
    val e = freshEngine("mvi-avg-join")
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.dim (grp varchar, label varchar)"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.dim VALUES ('a', 'alpha'), ('b', 'beta'), ('c', 'gamma')"))
    val defJoin = """SELECT d.label AS label, avg(s.v) AS m
                    |FROM demo.src s JOIN demo.dim d ON s.grp = d.grp
                    |GROUP BY d.label""".stripMargin
    val defGlobal = "SELECT avg(v) AS m, count(*) AS n FROM demo.src"
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvaj AS $defJoin"))
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvag AS $defGlobal"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (4, 'c', 41), (5, 'a', 2)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES ('z', 'zeta')"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvaj"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assertMatchesRecompute(e, "mvaj", defJoin, "label")
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvag"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assertMatchesRecompute(e, "mvag", defGlobal, "n")
  }

  test("drop/recreate of a source forces recompute — never a false noop or tail replay") {
    val e = freshEngine("mvi-recreate")
    val defSql = "SELECT grp, sum(v) AS total FROM demo.src GROUP BY grp"
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvr AS $defSql"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (4, 'b', 40)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvr"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    // recreate the source at the SAME snapshot id with different content:
    // per-table sequential ids restart at 1, so id comparison alone would
    // call the second state "already refreshed" (false noop)
    e.executeNonQuery(SqlStatement("DROP TABLE demo.src"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.src (id bigint, grp varchar, v bigint)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (9, 'z', 900)"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (10, 'z', 1)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvr"))
    assert(e.lastMvRefreshMode === "full",
      s"recreated source must recompute, got ${e.lastMvRefreshMode}")
    assert(rows(e, "SELECT grp, total FROM demo.mvr ORDER BY grp") ===
      Seq(Seq("z", 901L)))
    // the recompute re-recorded the NEW incarnation: incremental works again
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (11, 'z', 9)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvr"))
    assert(e.lastMvRefreshMode === "incremental-merge")
    assertMatchesRecompute(e, "mvr", defSql, "grp")
  }

  test("replay whose schema drifted from the MV's falls back to recompute") {
    val e = freshEngine("mvi-drift")
    e.executeNonQuery(SqlStatement(
      "CREATE MATERIALIZED VIEW demo.mvs AS SELECT * FROM demo.src"))
    // SELECT * re-planned after ADD COLUMN yields an extra column the
    // materialized table does not declare — appending that delta would
    // either fail or corrupt; the refresh must recompute instead
    e.executeNonQuery(SqlStatement("ALTER TABLE demo.src ADD COLUMN w bigint"))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.src VALUES (4, 'c', 40, 400)"))
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvs"))
    assert(e.lastMvRefreshMode === "full")
    assert(rows(e, "SELECT * FROM demo.mvs ORDER BY id").map(_.length).distinct === Seq(4))
    assert(rows(e, "SELECT w FROM demo.mvs WHERE id = 4") === Seq(Seq(400L)))
  }

  test("concurrent refreshes: same MV serialized, shared-source MVs independent") {
    val e = freshEngine("mvi-concurrent")
    val defA = "SELECT grp, count(*) AS n FROM demo.src GROUP BY grp"
    val defB = "SELECT grp, sum(v) AS total FROM demo.src GROUP BY grp"
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mva AS $defA"))
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvb AS $defB"))
    e.executeNonQuery(SqlStatement(
      "INSERT INTO demo.src VALUES (4, 'c', 40), (5, 'c', 4)"))
    // two threads refresh DIFFERENT MVs over the SAME source (the delta
    // temp-view name must not collide), plus a racing same-MV refresh
    // (serialized by the per-view lock — the delta must land exactly once)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = Seq(
      Future(e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mva"))),
      Future(e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvb"))),
      Future(e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mva"))))
    fs.foreach(Await.result(_, 120.seconds))
    assertMatchesRecompute(e, "mva", defA, "grp")
    assertMatchesRecompute(e, "mvb", defB, "grp")
  }

  test("join MV: a dim delta prunes the fact-side replay to the delta's keys") {
    val e = new GraftEngine(spark, tmpDir("mvi-dimprune"))
    e.executeNonQuery(SqlStatement(
      "CREATE TABLE demo.fact (id bigint, k bigint, v bigint)"))
    e.executeNonQuery(SqlStatement("CREATE TABLE demo.dim (k bigint, label varchar)"))
    // three fact files with DISJOINT key ranges (one multi-row file per
    // commit so manifest bounds are real)
    def ins(rows: (Long, Long, Long)*): Unit =
      e.catalog.insert("demo", "fact", rows.toSeq.toDF("id", "k", "v").coalesce(1))
    ins((1L, 1L, 10L), (2L, 2L, 20L), (3L, 3L, 30L))
    ins((11L, 11L, 10L), (12L, 12L, 20L))
    ins((21L, 21L, 10L), (22L, 22L, 20L))
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES (1, 'a'), (11, 'b')"))
    val defSql = """SELECT f.id, d.label, f.v FROM demo.fact f
                   |JOIN demo.dim d ON f.k = d.k""".stripMargin
    e.executeNonQuery(SqlStatement(s"CREATE MATERIALIZED VIEW demo.mvj AS $defSql"))
    // dim-only delta whose key lives ONLY in the third fact file; corrupt
    // the other two — the A_old ⋈ ΔB replay must prune them via the
    // pushed IN filter + manifest bounds and never open them
    e.executeNonQuery(SqlStatement("INSERT INTO demo.dim VALUES (21, 'c')"))
    val files = e.query(SqlStatement("""SELECT file_path FROM demo."fact$files""""))
      .collect().map(_.getString(0))
    def corrupt(path: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = f.create(p, true)
      out.write("not parquet".getBytes("UTF-8")); out.close()
    }
    // identify files by insertion order: the $files listing carries all
    // three; corrupt every file except the one holding ids 21/22
    val keep = files.filter(_.contains("snap-00003"))
    assert(keep.nonEmpty, s"expected the third commit's file among:\n${files.mkString("\n")}")
    files.filterNot(keep.contains).foreach(corrupt)
    e.executeNonQuery(SqlStatement("REFRESH MATERIALIZED VIEW demo.mvj"))
    assert(e.lastMvRefreshMode === "incremental-append")
    assert(rows(e, "SELECT id, label, v FROM demo.mvj ORDER BY id") ===
      Seq(Seq(1L, "a", 10L), Seq(11L, "b", 10L), Seq(21L, "c", 10L)))
  }

  test("classify: shapes at the boundary") {
    val e = freshEngine("mvi-classify")
    def c(sql: String) = MvIncremental.classify(e.spark, sql,
      Set(("demo", "src")), "default")
    def cj(sql: String) = MvIncremental.classify(e.spark, sql,
      Set(("demo", "src"), ("demo", "dim")), "default")
    assert(cj("""SELECT s.id, d.label FROM demo.src s
                |JOIN demo.dim d ON s.grp = d.grp""".stripMargin) ===
      Some(MvIncremental.MvProjectShape))
    assert(cj("""SELECT d.label AS label, count(*) AS n FROM demo.src s
                |JOIN demo.dim d ON s.grp = d.grp GROUP BY d.label""".stripMargin) ===
      Some(MvIncremental.MvAggShape(Seq(MvIncremental.MvKey, MvIncremental.MvMerge("count")))))
    assert(cj("""SELECT s.id, d.label FROM demo.src s
                |LEFT JOIN demo.dim d ON s.grp = d.grp""".stripMargin) === None)
    assert(cj("""SELECT s.id FROM demo.src s JOIN demo.dim d ON s.grp = d.grp
                |JOIN demo.src s2 ON s.id = s2.id""".stripMargin) === None)
    assert(c("SELECT * FROM demo.src") === Some(MvIncremental.MvProjectShape))
    assert(c("SELECT id, upper(grp) AS g FROM demo.src WHERE v > 0") ===
      Some(MvIncremental.MvProjectShape))
    assert(c("SELECT grp, count(*) AS n FROM demo.src GROUP BY grp") ===
      Some(MvIncremental.MvAggShape(Seq(MvIncremental.MvKey, MvIncremental.MvMerge("count")))))
    // a GROUP-BY-less aggregate parses as Project — must NOT read as row-wise
    assert(c("SELECT count(*) AS n FROM demo.src") ===
      Some(MvIncremental.MvAggShape(Seq(MvIncremental.MvMerge("count")))))
    assert(c("SELECT DISTINCT grp FROM demo.src") === None) // Distinct node
    assert(c("SELECT grp FROM demo.src WHERE rand() < 2") === None) // non-det
    assert(c("SELECT id FROM demo.src WHERE v > (SELECT min(v) FROM demo.src)") === None)
    assert(c("SELECT grp, count(*) AS n FROM demo.other GROUP BY grp") === None)
    // grouping key absent from the output: groups not reconstructible
    assert(c("SELECT count(*) AS n FROM demo.src GROUP BY grp") === None)
    assert(c("WITH x AS (SELECT * FROM demo.src) SELECT grp FROM x") === None)
  }
}
