package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.GraftEngine
import graft.params.Sql._

/** Runnable end-to-end tour of the engine's client surface — the analogue of
  * the reference's examples/TrinoClientExample/Program.cs walkthrough
  * (schema → table → insert → query → scalar → time travel → unload).
  *
  * Run: sbt "runMain graft.examples.Example [workDir]"
  */
object Example {
  case class Employee(employeeId: Int, firstName: String, lastName: String)

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-example").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-example")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val engine = new GraftEngine(spark, s"$work/warehouse")

    // CREATE SCHEMA + TABLE as SQL text, exactly like the reference's seed
    // scripts (Program.cs:32-45, Scripts/create/01-schema.sql) — the DDL
    // routes into the snapshot catalog, catalog qualifier and all
    engine.executeScript(
      """-- seed DDL (reference Scripts/create shape)
        |CREATE SCHEMA IF NOT EXISTS iceberg.example;
        |CREATE TABLE IF NOT EXISTS iceberg.example.employee_data (
        |    employee_id int,
        |    first_name varchar,
        |    last_name varchar
        |);""".stripMargin)
    println(s"[1] created schema 'example' + table employee_data from SQL script under $work/warehouse")

    // INSERT → snapshot 1 (Program.cs:51-55)
    val s1 = engine.catalog.insert("example", "employee_data",
      Seq((1, "John", "Doe"), (2, "Jane", "Smith"))
        .toDF("employee_id", "first_name", "last_name"))
    println(s"[3] insert #1 committed snapshot ${s1.snapshotId} at ${s1.committedAtMillis}")

    // second INSERT → snapshot 2
    val s2 = engine.catalog.insert("example", "employee_data",
      Seq((3, "Ada", "Lovelace")).toDF("employee_id", "first_name", "last_name"))
    println(s"[4] insert #2 committed snapshot ${s2.snapshotId}")

    // typed query with snake_case→camelCase mapping over the VERBATIM
    // catalog-qualified name — no registration step (Program.cs:58-62)
    val emps = engine.queryAs[Employee](
      sql"SELECT employee_id, first_name, last_name FROM iceberg.example.employee_data ORDER BY employee_id")
    println(s"[5] queryAs[Employee] → ${emps.mkString("; ")}")

    // parameterized scalar (Program.cs:77-80)
    val minId = 2
    val n = engine.queryScalar[Long](
      sql"SELECT COUNT(*) FROM example.employee_data WHERE employee_id >= $minId")
    println(s"[6] queryScalar count(employee_id >= $minId) = $n")

    // time travel at the instant of commit 1 (AthenaClientTests.cs:374)
    val asOf = java.time.Instant.ofEpochMilli(s1.committedAtMillis)
    val old = engine.query(
      sql"SELECT employee_id, first_name FROM example.employee_data FOR TIMESTAMP AS OF TIMESTAMP $asOf ORDER BY employee_id")
      .collect().map(r => s"${r.getInt(0)}:${r.getString(1)}").mkString(",")
    println(s"[7] time travel to commit 1 → [$old]")

    // unload to flat parquet (Program.cs / AthenaClient.cs:116-208)
    val resp = engine.unload(
      sql"SELECT employee_id, first_name, last_name FROM example.employee_data",
      s"$work/exports/employees")
    println(s"[8] unload → ${resp.rowCount} rows at ${resp.path}")
    val exported = new java.io.File(s"$work/exports/employees").listFiles()
      .map(f => s"${f.getName} (${f.length}B)").sorted.mkString(", ")
    println(s"[9] export dir contents: $exported")

    // storage ops round-trip (S3ClientTests.cs:65-106)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$work/note.txt"),
      "hello graft".getBytes)
    engine.storage.upload(s"$work/note.txt", s"$work/warehouse/notes/note.txt")
    val listed = engine.storage.list(s"$work/warehouse/notes")
      .map(i => s"${i.key.split('/').last}=${i.size}B").mkString(",")
    println(s"[10] storage upload+list → $listed")

    // SQL INSERT → snapshot commit with rows-affected (S5/C5)
    val affected = engine.executeNonQuery(
      sql"INSERT INTO example.employee_data VALUES (4, 'Grace', 'Hopper')")
    println(s"[12] SQL INSERT affected $affected row(s); snapshots now = " +
      engine.catalog.snapshots("example", "employee_data").size)

    // snapshot maintenance: expire history, remove orphans
    val latest = engine.catalog.snapshots("example", "employee_data").last
    val expired = engine.catalog.expireSnapshots("example", "employee_data",
      latest.committedAtMillis)
    val orphans = engine.catalog.removeOrphanFiles("example", "employee_data")
    println(s"[13] expired snapshots ${expired.mkString(",")}; orphans removed: ${orphans.size}; " +
      "latest count = " + engine.catalog.readLatest("example", "employee_data").count())

    // native function via spark.sql.extensions injection
    val d = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    println(s"[11] dot_product via extensions = $d")
    val ic = spark.sql(
      "SELECT intersect_count(array(1L, 3L, 5L, 9L), array(3L, 4L, 5L)) AS i")
      .collect().head.getLong(0)
    println(s"[14] intersect_count via extensions = $ic")

    // schema evolution: add a column, old rows read back NULL
    engine.catalog.addColumn("example", "employee_data", "title", StringType)
    engine.catalog.insert("example", "employee_data",
      Seq((5, "Barbara", "Liskov", "Prof."))
        .toDF("employee_id", "first_name", "last_name", "title"))
    val withTitle = engine.catalog.readLatest("example", "employee_data")
    println(s"[15] after addColumn: schema=${withTitle.schema.fieldNames.mkString(",")}, " +
      s"null titles = ${withTitle.filter(withTitle("title").isNull).count()}")

    // skew-safe join: one hot key spread over salted reducers
    val hot = spark.range(1000).select(
      org.apache.spark.sql.functions.lit(1L).as("k"),
      org.apache.spark.sql.functions.col("id").as("v"))
    val dim = Seq((1L, "hot-dim")).toDF("k", "name")
    val joined = graft.operators.Skew.saltedJoin(hot, dim, "k", salts = 4).count()
    println(s"[16] saltedJoin matched $joined rows across 4 salt partitions")

    // MERGE INTO: the full Trino clause grammar on the snapshot catalog
    val merged = engine.executeNonQuery(graft.params.SqlStatement(
      """MERGE INTO example.employee_data t
        |USING (SELECT 2 AS id, 'Janet' AS fn UNION ALL SELECT 9, 'Grace') s
        |ON t.employee_id = s.id
        |WHEN MATCHED THEN UPDATE SET first_name = s.fn
        |WHEN NOT MATCHED THEN INSERT (employee_id, first_name) VALUES (s.id, s.fn)""".stripMargin))
    println(s"[17] MERGE INTO touched $merged rows (1 update + 1 insert) via the SQL surface")

    // views + introspection: persisted CREATE VIEW, SHOW/DESCRIBE
    engine.executeNonQuery(graft.params.SqlStatement(
      "CREATE VIEW example.first_names AS SELECT employee_id, first_name FROM example.employee_data"))
    val nTables = engine.query(graft.params.SqlStatement(
      "SHOW TABLES FROM example")).count()
    println(s"[18] SHOW TABLES sees $nTables relations (view included)")

    // metadata tables: commit history as a queryable table
    val nSnaps = engine.query(graft.params.SqlStatement(
      """SELECT count(*) AS n FROM example."employee_data$snapshots""""))
      .collect()(0).getLong(0)
    println(s"[19] employee_data$$snapshots lists $nSnaps commits")

    // zero-copy adoption: parquet written OUTSIDE the catalog joins the
    // table by reference (absolute-path manifest entries, no byte moves)
    {
      import spark.implicits._
      val ext = s"$work/external-batch"
      // the external batch must carry the table's declared columns
      val cols = engine.catalog.declaredSchema("example", "employee_data").get
      Seq((300, "Zoe", "Zed", "Dr")).toDF(cols.fieldNames.toIndexedSeq: _*)
        .select(cols.fields.map(f =>
          org.apache.spark.sql.functions.col(f.name).cast(f.dataType)).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(ext)
      val adopted = engine.executeNonQuery(graft.params.SqlStatement(
        s"ALTER TABLE example.employee_data EXECUTE add_files(location => '$ext')"))
      println(s"[20] add_files adopted $adopted external file(s) in place")
    }

    // detach / re-attach: unregister keeps every file; register brings
    // the table back whole (history included)
    engine.executeNonQuery(graft.params.SqlStatement(
      "CALL system.unregister_table('example', 'employee_data')"))
    engine.executeNonQuery(graft.params.SqlStatement(
      s"CALL system.register_table('example', 'employee_data', " +
        s"'$work/warehouse/example/employee_data')"))
    val back = engine.queryScalar[Long](graft.params.SqlStatement(
      "SELECT count(*) FROM example.employee_data")).get
    println(s"[21] unregister/register round trip: $back rows intact")

    // equality-delete upsert (format_version = 2): the streaming-CDC
    // write shape — one commit, no read of the target
    {
      import spark.implicits._
      engine.executeNonQuery(graft.params.SqlStatement(
        "CREATE TABLE example.kv (k bigint, v varchar) WITH (format_version = 2)"))
      engine.executeNonQuery(graft.params.SqlStatement(
        "INSERT INTO example.kv VALUES (1, 'a'), (2, 'b')"))
      engine.catalog.upsert("example", "kv",
        Seq((2L, "B"), (3L, "c")).toDF("k", "v"), Seq("k"))
      val kv = engine.query(graft.params.SqlStatement(
        "SELECT k, v FROM example.kv ORDER BY k")).collect()
        .map(r => s"${r.getLong(0)}=${r.getString(1)}").mkString(",")
      println(s"[22] equality-delete upsert → $kv (last-wins, zero files rewritten)")
    }

    // migrate: somebody else's plain hive-partitioned parquet directory
    // becomes a catalog table IN PLACE — zero copies, files table-owned
    {
      import spark.implicits._
      val lake = s"$work/legacy-lake"
      Seq((1L, 2024, "x"), (2L, 2025, "y")).toDF("id", "year", "v")
        .write.partitionBy("year").mode("overwrite").parquet(lake)
      engine.executeNonQuery(graft.params.SqlStatement(
        s"CALL system.migrate('example', 'legacy', '$lake')"))
      val m = engine.queryScalar[Long](graft.params.SqlStatement(
        "SELECT count(*) FROM example.legacy WHERE year = 2025")).get
      println(s"[23] migrate converted the legacy layout in place ($m row in year=2025, partition-pruned)")
    }

    // timestamp rollback: undo to "how the table looked before the fix"
    {
      val snaps = engine.catalog.snapshots("example", "kv")
      val lit = java.time.Instant.ofEpochMilli(snaps.head.committedAtMillis)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      engine.executeNonQuery(graft.params.SqlStatement(
        s"ALTER TABLE example.kv EXECUTE rollback_to_timestamp(timestamp => TIMESTAMP '$lit')"))
      val n = engine.queryScalar[Long](graft.params.SqlStatement(
        "SELECT count(*) FROM example.kv")).get
      println(s"[24] rollback_to_timestamp restored the pre-upsert state ($n rows; history intact)")
    }

    spark.stop()
    println("[done]")
  }
}
