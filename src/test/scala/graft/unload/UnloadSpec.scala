package graft.unload

import graft.SparkSpec

/** Unload/export contract, ported from the reference's unload tests
  * (reference tests/IntegrationTests/AthenaClientTests.cs:99-345).
  */
class UnloadSpec extends SparkSpec {
  import spark.implicits._

  test("unload writes flat parquet at target root — no subdirs (AthenaClientTests.cs:158-169)") {
    val target = tmpDir("unload-out") + "/export1"
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val resp = new Unloader(spark).unload(df, target)
    assert(resp.rowCount == 3)
    assert(resp.path.endsWith("export1"))
    val files = new java.io.File(target).listFiles()
    assert(files.nonEmpty)
    // only bare parquet files, nonzero size, no data/ or metadata/ dirs
    assert(files.forall(f => f.isFile && f.getName.endsWith(".parquet") && f.length > 0),
      files.map(_.getName).mkString(","))
    // round-trip
    assert(spark.read.parquet(target).count() == 3)
  }

  test("unload to a different base location (cross-bucket, AthenaClientTests.cs:278-345)") {
    val otherBase = tmpDir("other-bucket")
    val resp = new Unloader(spark)
      .unload(Seq(1, 2).toDF("x"), s"$otherBase/deep/nested/exports")
    assert(resp.rowCount == 2)
    assert(spark.read.parquet(s"$otherBase/deep/nested/exports").count() == 2)
  }

  test("temp dirs are cleaned up (AthenaClient.cs:174-196)") {
    val base = tmpDir("unload-clean")
    val target = s"$base/out"
    new Unloader(spark).unload(Seq(1).toDF("x"), target)
    val leftover = new java.io.File(base).listFiles().map(_.getName).filter(_ == "_unload_temp")
    assert(leftover.isEmpty)
  }

  test("failure is wrapped with the target path (AthenaClient.cs:200-207)") {
    // a df whose evaluation explodes at write time (ANSI division by zero)
    val bad = spark.sql("SELECT 1/0 AS x")
    val e = intercept[UnloadException] {
      new Unloader(spark).unload(bad, tmpDir("unload-err") + "/t")
    }
    assert(e.getMessage.contains("Failed to unload data to path"))
  }
}
