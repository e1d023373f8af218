package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-format source/sink round-trips (CSV, JSON lines, ORC) with
  * explicit schemas — value-equality asserted against the parquet original.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nation = graft.Tables.nation(spark, sf001)

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, Int)] =
    df.select($"n_nationkey", $"n_name", $"n_regionkey")
      .as[(Int, String, Int)].collect().sortBy(_._1).toSeq

  test("CSV round-trip preserves values under an explicit schema") {
    val dir = tmpDir("fmt-csv")
    Formats.writeCsv(nation, s"$dir/nation_csv")
    val back = Formats.readCsv(spark, s"$dir/nation_csv", nation.schema)
    assert(sortedRows(back) == sortedRows(nation))
  }

  test("JSON-lines round-trip preserves values") {
    val dir = tmpDir("fmt-json")
    Formats.writeJsonLines(nation, s"$dir/nation_json")
    val back = Formats.readJsonLines(spark, s"$dir/nation_json", nation.schema)
    assert(sortedRows(back) == sortedRows(nation))
  }

  test("ORC round-trip preserves values and schema") {
    val dir = tmpDir("fmt-orc")
    Formats.writeOrc(nation, s"$dir/nation_orc")
    val back = Formats.readOrc(spark, s"$dir/nation_orc")
    assert(back.schema == nation.schema)
    assert(sortedRows(back) == sortedRows(nation))
  }

  test("CSV with timestamps round-trips at microsecond precision") {
    val dir = tmpDir("fmt-csv-ts")
    val ev = graft.Tables.events(spark, sf001)
      .select($"event_id", $"ts").limit(100)
    Formats.writeCsv(ev, s"$dir/ev_csv")
    val back = Formats.readCsv(spark, s"$dir/ev_csv", ev.schema)
    val a = ev.as[(Long, java.sql.Timestamp)].collect().sortBy(_._1).toSeq
    val b = back.as[(Long, java.sql.Timestamp)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("schema'd read never silently drops malformed rows without trace columns") {
    val dir = tmpDir("fmt-bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.csv"),
      "n_nationkey,n_name,n_regionkey\n1,OK,2\nnot_an_int,X,9\n".getBytes)
    val back = Formats.readCsv(spark, dir, nation.schema)
    // default PERMISSIVE mode: malformed numeric -> null, row retained
    val rows = back.select($"n_nationkey", $"n_name").as[(Option[Int], String)]
      .collect().sortBy(_._2)
    assert(rows.length == 2)
    assert(rows.contains((None, "X")))
  }
}
