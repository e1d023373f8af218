package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.functions.col

/** Unit pins for the metadata-delete totality proof
  * ([[Manifests.mustMatch]] and the ColumnNode twin
  * [[org.apache.spark.sql.GraftBoundsBridge.mustMatchColumn]]): a false
  * positive here DROPS LIVE ROWS, so every rule gets a direct case —
  * especially the blockers (nulls, unknown null counts, double kind,
  * unrecognized shapes must all answer FALSE).
  */
class MustMatchSpec extends SparkSpec {

  private def entry(rows: Long, bounds: (String, ColBounds)*): DataFileEntry =
    DataFileEntry("f.parquet", rows, 1024L, bounds.toMap)

  private def must(sql: String, e: DataFileEntry): Boolean =
    Manifests.mustMatch(CatalystSqlParser.parseExpression(sql), e)

  private val id13 = entry(3L, "id" -> ColBounds("long", "1", "3", 0L))

  test("range totality: every comparison direction, strict and inclusive") {
    assert(must("id < 4", id13))
    assert(must("id <= 3", id13))
    assert(!must("id < 3", id13)) // max row is 3: 3 < 3 is false
    assert(!must("id <= 2", id13))
    assert(must("id > 0", id13))
    assert(must("id >= 1", id13))
    assert(!must("id > 1", id13)) // min row is 1
    // literal-first spellings mirror exactly
    assert(must("4 > id", id13))
    assert(must("1 <= id", id13))
    assert(!must("3 > id", id13))
  }

  test("equality totality only for constant columns; IN via a constant member") {
    val const5 = entry(2L, "id" -> ColBounds("long", "5", "5", 0L))
    assert(must("id = 5", const5))
    assert(!must("id = 5", id13))
    assert(must("id IN (4, 5)", const5))
    assert(!must("id IN (1, 2, 3)", id13)) // covers the range, but rows vary
  }

  test("blockers: any nulls, unknown null count, double kind, weird shapes") {
    assert(!must("id < 4", entry(3L, "id" -> ColBounds("long", "1", "3", 1L))))
    assert(!must("id < 4", entry(3L, "id" -> ColBounds("long", "1", "3", -1L))))
    assert(!must("v < 4.0", entry(3L, "v" -> ColBounds("double", "1.0", "3.0", 0L))))
    assert(!must("id < 4", entry(3L))) // no bounds tracked at all
    assert(!must("id % 2 = 1", id13)) // unrecognized shape
    assert(!must("NOT (id > 3)", id13)) // negation not analyzed
  }

  test("multi-part names never bind by last part (nested/qualified refs)") {
    // a nested struct field `meta.ts` (or a misqualified `t2.id`) sharing
    // a leaf name with a top-level column must NOT bind to that column's
    // bounds: in mustMatch a wrong bind is a false totality proof that
    // drops live rows
    val ts13 = entry(3L, "ts" -> ColBounds("long", "1", "3", 0L))
    assert(!must("meta.ts < 100", ts13))
    assert(!must("t.ts < 100", ts13))
    assert(!must("a.b.ts < 100", ts13))
    assert(must("ts < 100", ts13)) // bare single-part still proves
    // mayMatch side: a wrong bind would over-prune the probe — the
    // multi-part ref must KEEP the file even when ts-bounds exclude it
    assert(Manifests.mayMatch(CatalystSqlParser.parseExpression("meta.ts = 99"), ts13))
    assert(!Manifests.mayMatch(CatalystSqlParser.parseExpression("ts = 99"), ts13))
    // ColumnNode twin: col("meta.ts") parses to nameParts ["meta","ts"]
    import org.apache.spark.sql.GraftBoundsBridge.{mustMatchColumn, mayMatchColumn}
    assert(!mustMatchColumn(col("meta.ts") < 100, ts13))
    assert(mustMatchColumn(col("ts") < 100, ts13))
    assert(mayMatchColumn(col("meta.ts") === 99, ts13))
  }

  test("null-shape proofs: IS NULL needs all-null, IS NOT NULL needs zero") {
    val allNull = entry(4L, "id" -> ColBounds("long", null, null, 4L))
    assert(must("id IS NULL", allNull))
    assert(!must("id IS NULL", id13))
    assert(must("id IS NOT NULL", id13))
    assert(!must("id IS NOT NULL", entry(3L, "id" -> ColBounds("long", "1", "3", 1L))))
  }

  test("string bounds are exact-or-absent, so string totality is sound") {
    val ac = entry(3L, "s" -> ColBounds("string", "a", "c", 0L))
    assert(must("s < 'd'", ac))
    assert(must("s <= 'c'", ac))
    assert(!must("s < 'c'", ac))
    assert(must("s >= 'a'", ac))
  }

  test("boolean composition: AND needs all, OR needs one") {
    val e = entry(3L,
      "id" -> ColBounds("long", "1", "3", 0L),
      "k"  -> ColBounds("long", "10", "20", 0L))
    assert(must("id < 4 AND k <= 20", e))
    assert(!must("id < 4 AND k < 20", e))
    assert(must("id < 2 OR k <= 20", e))
    assert(!must("id < 2 OR k < 15", e))
  }

  test("ColumnNode twin agrees with the catalyst walker") {
    import org.apache.spark.sql.GraftBoundsBridge.mustMatchColumn
    assert(mustMatchColumn(col("id") < 4, id13))
    assert(!mustMatchColumn(col("id") < 3, id13))
    assert(mustMatchColumn(col("id") >= 1 && col("id") <= 3, id13))
    assert(!mustMatchColumn(col("id") === 2, id13))
    // the DELETE path's actual shape: coalesce(cond, false)
    assert(mustMatchColumn(
      org.apache.spark.sql.functions.coalesce(
        col("id") < 4, org.apache.spark.sql.functions.lit(false)), id13))
    // SQL-text conditions route through the parsed-expression walker
    assert(mustMatchColumn(org.apache.spark.sql.functions.expr("id < 4"), id13))
    assert(!mustMatchColumn(org.apache.spark.sql.functions.expr("id < 3"), id13))
  }

  test("mustMatch implies mayMatch (never prove totality of the infeasible)") {
    val preds = Seq("id < 4", "id <= 3", "id > 0", "id = 2", "id = 5",
      "id < 1", "id IS NOT NULL", "id IS NULL", "id IN (1,2,3)")
    for (p <- preds) {
      val ex = CatalystSqlParser.parseExpression(p)
      assert(!Manifests.mustMatch(ex, id13) || Manifests.mayMatch(ex, id13),
        s"'$p' claimed total but infeasible")
    }
  }
}
