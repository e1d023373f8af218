package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order clustering (`sorted_by = ARRAY['zorder(x, y)']` — Iceberg's
  * rewrite_data_files z-order sort strategy, Delta's OPTIMIZE ZORDER):
  * writes interleave per-column quantile buckets into one clustering
  * key, so every file's manifest bounds are tight on EVERY z column —
  * predicates on the SECOND dimension prune files, which lexicographic
  * sorting structurally cannot do (its trailing columns span the full
  * range in every file).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-zorder-wh"))
    c.createSchema("s")
    c
  }

  private val schema = StructType(Seq(
    StructField("x", LongType), StructField("y", LongType),
    StructField("v", LongType)))

  /** 64×64 grid: x and y each uniform over 0..63. */
  private def grid = (0L until 4096L).map(i => (i % 64L, i / 64L, i))
    .toDF("x", "y", "v")

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1)
    scans.head.metrics("numFiles").value
  }

  test("z-order files bound BOTH dimensions; second-dimension predicates prune") {
    val c = freshCatalog()
    c.createTable("s", "z", schema, sortedBy = Seq("zorder(x, y)"))
    c.insert("s", "z", grid)
    c.compact("s", "z", numFiles = 8)
    // the lexicographic control: same data, sorted_by x then y
    c.createTable("s", "lex", schema, sortedBy = Seq("x", "y"))
    c.insert("s", "lex", grid)
    c.compact("s", "lex", numFiles = 8)

    assert(filesRead(c.readLatest("s", "z")) == 8)
    assert(filesRead(c.readLatest("s", "lex")) == 8)
    // per-file y-bounds: z-order files each cover a sub-range; every lex
    // file spans the full y range
    def ySpans(t: String): Seq[(Long, Long)] = c
      .manifestEntries("s", t, c.snapshots("s", t).last)
      .flatMap(_.bounds.collectFirst {
        case (k, cb) if k.equalsIgnoreCase("y") && cb.min != null =>
          (cb.min.toLong, cb.max.toLong)
      })
    assert(ySpans("lex").forall { case (lo, hi) => lo == 0L && hi == 63L })
    // range-partition boundaries cut the z-curve mid-cell, so spans
    // exceed the ideal 16/32 cell sizes a little — the property that
    // matters is that NO file spans the full range (lex files all do)
    assert(ySpans("z").forall { case (lo, hi) => hi - lo <= 40L },
      s"z files should each bound y well under the full range, got ${ySpans("z")}")
    // a y-only predicate prunes z files but must read every lex file
    val zFiles = filesRead(c.readLatest("s", "z").filter(col("y") === 5L))
    val lexFiles = filesRead(c.readLatest("s", "lex").filter(col("y") === 5L))
    assert(lexFiles == 8L)
    assert(zFiles < 8L, s"expected y=5 to prune z-ordered files, read $zFiles")
    // both stay correct
    assert(c.readLatest("s", "z").filter(col("y") === 5L).count() == 64L)
    assert(c.readLatest("s", "lex").filter(col("y") === 5L).count() == 64L)
    // point predicates on both dimensions prune hardest
    assert(filesRead(c.readLatest("s", "z")
      .filter(col("x") === 7L && col("y") === 9L)) <= 2L)
  }

  test("zorder validates its columns at CREATE time") {
    val c = freshCatalog()
    val withStr = StructType(Seq(
      StructField("x", LongType), StructField("name", StringType)))
    intercept[IllegalArgumentException](
      c.createTable("s", "bad1", withStr, sortedBy = Seq("zorder(x, name)")))
    intercept[IllegalArgumentException](
      c.createTable("s", "bad2", withStr, sortedBy = Seq("zorder(x, nope)")))
    intercept[IllegalArgumentException](
      c.createTable("s", "bad3", withStr, sortedBy = Seq("zorder(x)")))
  }

  test("DROP/RENAME COLUMN guards and rewrites see through zorder entries") {
    val c = freshCatalog()
    c.createTable("s", "g", schema, sortedBy = Seq("zorder(x, y)"))
    c.insert("s", "g", grid.limit(64))
    intercept[IllegalArgumentException](c.dropColumn("s", "g", "y"))
    c.renameColumn("s", "g", "y", "y2")
    assert(c.sortSpec("s", "g") == Seq("zorder(x, y2)"))
    // the renamed spec still writes (clustering resolves y2)
    c.insert("s", "g", Seq((1L, 2L, 3L)).toDF("x", "y2", "v"))
    assert(c.readLatest("s", "g").count() == 65L)
  }

  test("z-write with NULLs in a z column clusters them at the low edge") {
    // pins the one-pass multi-column quantile rewrite: the sketch must
    // skip null/NaN PER COLUMN (like the old per-column na.drop), so a
    // null-bearing column's cuts come from its non-null values only and
    // null rows land in bucket 0 (cluster together in the lowest file)
    val c = freshCatalog()
    val withNulls = (0L until 4096L).map { i =>
      (i % 64L, if (i % 7L == 0L) None else Some(i / 64L), i)
    }.toDF("x", "y", "v")
    c.createTable("s", "zn", schema, sortedBy = Seq("zorder(x, y)"))
    c.insert("s", "zn", withNulls)
    c.compact("s", "zn", numFiles = 8)
    assert(c.readLatest("s", "zn").count() == 4096L)
    assert(c.readLatest("s", "zn").filter(col("y").isNull).count() == 586L)
    // non-null y-bounds still sub-range (quantiles unpolluted by nulls)
    val spans = c.manifestEntries("s", "zn", c.snapshots("s", "zn").last)
      .flatMap(_.bounds.collectFirst {
        case (k, cb) if k.equalsIgnoreCase("y") && cb.min != null =>
          (cb.min.toLong, cb.max.toLong)
      })
    assert(spans.nonEmpty && spans.forall { case (lo, hi) => hi - lo <= 40L },
      s"null-bearing z column should still bound y sub-range, got $spans")
  }

  test("zorder through the SQL DDL surface round-trips SHOW CREATE") {
    val c = freshCatalog()
    val e = new graft.GraftEngine(spark, c.warehouse)
    e.executeNonQuery(graft.params.SqlStatement(
      """CREATE TABLE s.zs (a bigint, b double, v bigint)
        |WITH (sorted_by = ARRAY['zorder(a, b)'])""".stripMargin))
    e.executeNonQuery(graft.params.SqlStatement(
      "INSERT INTO s.zs VALUES (1, 1.5, 10), (2, 2.5, 20)"))
    assert(e.query(graft.params.SqlStatement(
      "SELECT count(*) AS n FROM s.zs")).as[Long].head() == 2L)
    val ddl = e.query(graft.params.SqlStatement("SHOW CREATE TABLE s.zs"))
      .collect().map(_.getString(0)).mkString("\n")
    assert(ddl.contains("zorder(a, b)"), s"SHOW CREATE lost the zorder spec:\n$ddl")
  }
}
