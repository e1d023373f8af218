package graft

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.reflect.ClassTag

import graft.params.SqlStatement
import graft.mapper.ResultMapper
import graft.catalog.SnapshotCatalog
import graft.unload.{StorageOps, Unloader, UnloadResponse}

/** The engine facade — the Spark-native equivalent of the reference's
  * AthenaClient + TrinoIcebergStack client surface (reference
  * src/AthenaTrinoClient/AthenaClient.cs, IAthenaClient.cs):
  *
  *   - `query`        — parameterized SQL → DataFrame (lazily planned)
  *   - `queryAs[T]`   — typed query with snake_case→camelCase mapping (C2)
  *   - `queryScalar`  — first row/first column as Option[T] (C3)
  *   - `executeNonQuery` / `executeBatch` — DDL/DML (C5,
  *     TrinoIcebergStack.cs:206-257)
  *   - `unload`       — query → flat Parquet export (C4)
  *   - snapshot catalog with INSERT commits + `FOR TIMESTAMP AS OF` (T1)
  *
  * Where the reference shipped SQL text over HTTP to a Trino coordinator
  * (AthenaClient.cs:213-225), here the statement goes straight into
  * Catalyst: parse → analyze → optimize → whole-stage codegen → executor
  * tasks, with pushdown/pruning for free (SURVEY.md §4).
  */
class GraftEngine(val spark: SparkSession, val warehouse: String) {

  val catalog = new SnapshotCatalog(spark, warehouse)
  val storage = new StorageOps(spark.sparkContext.hadoopConfiguration)
  private val unloader = new Unloader(spark)

  /** Session default schema (the reference session carries
    * ClientSessionProperties { Catalog, Schema } so unqualified names
    * resolve — AthenaClient.cs:37-45). Set via `USE [catalog.]<schema>`;
    * every unqualified table name in queries, DML, and DDL resolves
    * against it. Starts at `default`, Trino's usual fallback.
    */
  @volatile private var sessionSchema: String = "default"

  /** The schema unqualified names currently resolve against. */
  def currentSchema: String = sessionSchema
  // structured-logging surface ("What's missing" r3 #2): level-guarded,
  // so the disabled default costs one boolean per statement
  private val log = graft.logging.Log(classOf[GraftEngine])

  // ---- query surface ----

  def query(stmt: SqlStatement): DataFrame =
    try {
      graft.logging.Log.debug(log, "Executing statement: {0}", stmt.text)
      expandExecute(stmt.text) match {
        case Some(expanded) => query(SqlStatement(expanded))
        case None =>
          introspectionQuery(stmt.text).getOrElse(
            spark.sql(rewriteBareRefs(rewriteCatalogRefs(
              rewriteTimeTravel(rewriteMetadataRefs(
                rewriteNullOrdering(stmt.text)))))))
      }
    } catch {
      // parse + analysis failures (ParseException extends AnalysisException)
      // → typed contract naming the statement, the parity point with the
      // reference's TrinoAggregateException
      // (TrinoClientIntegrationTests.cs:126-132)
      case e: org.apache.spark.sql.AnalysisException =>
        graft.logging.Log.error(log, e, "Statement failed to parse/analyze: {0}", stmt.text)
        throw new GraftQueryException(stmt.text, "SQL failed to parse/analyze", e)
    }

  /** Typed query (reference QueryAsync<T>, AthenaClient.cs:55-70). */
  def queryAs[T: Encoder](stmt: SqlStatement): Seq[T] =
    ResultMapper.datasetOf[T](query(stmt)).collect().toIndexedSeq

  /** Scalar query (reference QueryScalarAsync<T>, AthenaClient.cs:72-104). */
  def queryScalar[T: ClassTag](stmt: SqlStatement): Option[T] =
    ResultMapper.scalar[T](query(stmt))

  /** Streaming typed cursor (reference ExecuteReader analogue,
    * TrinoAdoNetIntegrationTests.cs:57-119): rows surface incrementally
    * via `toLocalIterator` — one partition on the driver at a time, never
    * the whole result — so results larger than driver memory iterate
    * through. Same snake→camel mapping as [[queryAs]].
    */
  def queryIterator[T: Encoder](stmt: SqlStatement): Iterator[T] = {
    import scala.jdk.CollectionConverters._
    ResultMapper.datasetOf[T](query(stmt)).toLocalIterator().asScala
  }

  /** Untyped incremental reader with schema metadata (FieldCount /
    * GetName / IsDBNull parity) — see [[graft.mapper.GraftRowReader]].
    */
  def executeReader(stmt: SqlStatement): graft.mapper.GraftRowReader =
    new graft.mapper.GraftRowReader(query(stmt))

  /** DDL/DML without a result set. SQL-text DDL — CREATE SCHEMA [WITH
    * (location)], CREATE TABLE [IF NOT EXISTS] (+Iceberg-style
    * `partitioning = ARRAY[…]`), CTAS, DROP TABLE — routes into the
    * snapshot catalog, so the reference's seed scripts run verbatim
    * (Scripts/create/01-schema.sql, 02-tables.sql via ExecuteNonQuery,
    * TrinoIcebergStack.cs:152-197). INSERT INTO catalog tables commits a
    * snapshot and returns rows affected (S5: Scripts/insert/
    * 01-test-data.sql); -1 when the row count is unknown.
    */
  def executeNonQuery(stmt: SqlStatement): Long =
    trySession(stmt.text).getOrElse(
      tryDdl(stmt.text).orElse(tryInsert(stmt.text)).getOrElse {
        val rows = query(stmt).collect()
        if (rows.length == 1 && rows(0).length == 1) rows(0).get(0) match {
          case n: Number => n.longValue()
          case _         => -1L
        } else -1L
      })

  // ---- session statements: PREPARE / EXECUTE / DEALLOCATE (Trino's
  //      server-side prepared statements; the client-side twin is the
  //      params.Sql literal formatter) ----

  private val preparedStatements =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val prepareRe =
    """(?is)^\s*PREPARE\s+([A-Za-z_]\w*)\s+FROM\s+(.+?)\s*;?\s*$""".r
  private val deallocateRe =
    """(?is)^\s*DEALLOCATE\s+PREPARE\s+([A-Za-z_]\w*)\s*;?\s*$""".r
  private val executeStmtRe =
    """(?is)^\s*EXECUTE\s+([A-Za-z_]\w*)\s*(?:USING\s+(.+?))?\s*;?\s*$""".r
  private val useRe =
    """(?is)^\s*USE\s+(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\s*;?\s*$""".r

  /** PREPARE name FROM <stmt> / DEALLOCATE PREPARE name; an EXECUTE that
    * reaches the non-query surface expands and recurses (prepared DML —
    * Trino allows preparing any statement).
    */
  private def trySession(sqlText: String): Option[Long] = sqlText match {
    case useRe(schema) =>
      // USE [catalog.]<schema> — Trino's session-schema statement; a
      // leading catalog qualifier is accepted and dropped like everywhere
      // else in this engine. The schema must exist (Trino errors too).
      if (!catalog.schemaExists(schema))
        throw new GraftQueryException(sqlText, s"Schema $schema does not exist")
      sessionSchema = schema
      Some(0L)
    case prepareRe(name, body) =>
      // a PREPARE body that is itself PREPARE/EXECUTE/DEALLOCATE would
      // re-enter the expansion path unboundedly (PREPARE a FROM EXECUTE a
      // recursed to StackOverflowError) — reject it like Trino rejects
      // preparing session-control statements
      if (body.matches("""(?is)^\s*(PREPARE|EXECUTE|DEALLOCATE)\b.*"""))
        throw new GraftQueryException(sqlText,
          "Cannot PREPARE a session-control statement (PREPARE/EXECUTE/DEALLOCATE)")
      preparedStatements.put(name, body); Some(0L)
    case deallocateRe(name) =>
      if (preparedStatements.remove(name) == null)
        throw new GraftQueryException(sqlText, s"Prepared statement $name does not exist")
      Some(0L)
    case executeStmtRe(_, _) =>
      expandExecute(sqlText).map(t => executeNonQuery(SqlStatement(t)))
    case _ => None
  }

  /** Expand `EXECUTE name [USING e1, e2, …]` against the prepared-
    * statement store: each top-level `?` placeholder (never inside a
    * string literal) substitutes the corresponding USING expression,
    * parenthesized, positionally — Trino's EXECUTE…USING semantics.
    * Returns None when the text is not an EXECUTE statement.
    */
  private def expandExecute(sqlText: String): Option[String] = sqlText match {
    case executeStmtRe(name, using) =>
      val body = Option(preparedStatements.get(name)).getOrElse(
        throw new GraftQueryException(sqlText, s"Prepared statement $name does not exist"))
      val args = Option(using).map(graft.catalog.DdlParser.splitArgs)
        .getOrElse(Seq.empty)
      val out = new StringBuilder
      var inQuote = false
      var i = 0
      var argIdx = 0
      while (i < body.length) {
        val c = body.charAt(i)
        if (c == '\'') { inQuote = !inQuote; out += c }
        else if (c == '?' && !inQuote) {
          if (argIdx >= args.length)
            throw new GraftQueryException(sqlText,
              s"EXECUTE $name: statement has more parameters than USING values (${args.length})")
          out ++= s"(${args(argIdx)})"
          argIdx += 1
        } else out += c
        i += 1
      }
      if (argIdx < args.length)
        throw new GraftQueryException(sqlText,
          s"EXECUTE $name: ${args.length} USING values but only $argIdx parameters")
      Some(out.toString)
    case _ => None
  }

  private def tryDdl(sqlText: String): Option[Long] =
    (try graft.catalog.DdlParser.parse(sqlText, sessionSchema)
     catch { case e: IllegalArgumentException =>
       throw new GraftQueryException(sqlText, s"Malformed DDL: ${e.getMessage}", e) })
    .map {
      case graft.catalog.CreateSchemaStmt(schema, ifNotExists, location) =>
        if (catalog.schemaExists(schema)) {
          if (!ifNotExists)
            throw new GraftQueryException(sqlText, s"Schema $schema already exists")
          // IF NOT EXISTS on an existing schema is a NO-OP — re-running
          // createSchema here would overwrite the location marker and
          // orphan every table already under the old location
        } else catalog.createSchema(schema, location)
        0L
      case graft.catalog.CreateTableLikeStmt(schema, table, srcSchema,
          srcTable, includingProps, ifNotExists) =>
        if (!catalog.schemaExists(schema)) catalog.createSchema(schema)
        try { catalog.createTableLike(schema, table, srcSchema, srcTable,
          includingProps, ifNotExists); 0L }
        catch {
          case e: IllegalArgumentException =>
            throw new GraftQueryException(sqlText, e.getMessage, e)
          case e: IllegalStateException =>
            throw new GraftQueryException(sqlText, e.getMessage, e)
        }
      case graft.catalog.CreateTableStmt(schema, table, columns, ifNotExists,
          partitionedBy, tableComment, columnComments, formatVersion, sortedBy,
          bloomCols) =>
        if (!catalog.schemaExists(schema)) catalog.createSchema(schema)
        val preExisting = catalog.tableExists(schema, table)
        try catalog.createTable(schema, table, columns, ifNotExists, partitionedBy,
          formatVersion, sortedBy, bloomCols)
        catch {
          case e: IllegalStateException =>
            throw new GraftQueryException(sqlText, e.getMessage, e)
          case e: IllegalArgumentException =>
            throw new GraftQueryException(sqlText, e.getMessage, e)
        }
        // declared COMMENT clauses persist like COMMENT ON (never onto a
        // pre-existing IF NOT EXISTS table)
        if (!preExisting) {
          tableComment.foreach(c => catalog.setComment(schema, table, None, Some(c)))
          columnComments.foreach { case (cn, cv) =>
            catalog.setComment(schema, table, Some(cn), Some(cv)) }
        }
        0L
      case graft.catalog.CreateTableAsStmt(schema, table, select, ifNotExists, orReplace) =>
        if (ifNotExists && catalog.tableExists(schema, table)) 0L
        else {
          if (!catalog.schemaExists(schema)) catalog.createSchema(schema)
          if (orReplace)
            catalog.replaceTableAs(schema, table, query(SqlStatement(select)))
          else
            catalog.createTableAs(schema, table, query(SqlStatement(select)))
        }
      case graft.catalog.DropTableStmt(schema, table, ifExists) =>
        if (!catalog.tableExists(schema, table)) {
          if (ifExists) 0L
          else throw new GraftQueryException(sqlText, s"Table $schema.$table does not exist")
        } else { catalog.dropTable(schema, table); 0L }
      case graft.catalog.CommentStmt(schema, table, column, comment) =>
        requireCatalogTable(sqlText, schema, table)
        try { catalog.setComment(schema, table, column, comment); 0L }
        catch { case e: IllegalArgumentException =>
          throw new GraftQueryException(sqlText, e.getMessage, e) }
      case graft.catalog.DropSchemaStmt(schema, ifExists, cascade) =>
        if (!catalog.schemaExists(schema)) {
          if (ifExists) 0L
          else throw new GraftQueryException(sqlText, s"Schema $schema does not exist")
        } else {
          try { catalog.dropSchema(schema, cascade); 0L }
          catch { case e: IllegalArgumentException =>
            throw new GraftQueryException(sqlText, e.getMessage, e) }
        }
      case graft.catalog.SetPropertiesStmt(schema, table, properties) =>
        requireCatalogTable(sqlText, schema, table)
        properties.foreach { case (key, raw) =>
          def elems = graft.catalog.DdlParser.arrayLiteralElems(raw).getOrElse(
            throw new GraftQueryException(sqlText,
              s"Property $key expects an ARRAY['…'] value, got: $raw"))
          try key match {
            case "sorted_by"    => catalog.setSortSpec(schema, table, elems)
            case "partitioning" => catalog.setPartitionSpec(schema, table, elems)
            case "history.expire.min-snapshots-to-keep" =>
              val v = raw.trim.stripPrefix("'").stripSuffix("'")
              if (!v.toIntOption.exists(_ > 0))
                throw new GraftQueryException(sqlText,
                  s"$key expects a positive integer, got: $raw")
              catalog.setTableProperty(schema, table, key, v)
            case other => throw new GraftQueryException(sqlText,
              s"Unsupported table property: $other (supported: sorted_by, " +
                "partitioning, history.expire.min-snapshots-to-keep)")
          } catch { case e: IllegalArgumentException =>
            throw new GraftQueryException(sqlText, e.getMessage, e) }
        }
        0L
      case graft.catalog.AnalyzeStmt(schema, table) =>
        requireCatalogTable(sqlText, schema, table)
        // one aggregation pass; the result persists keyed by the head
        // snapshot so SHOW STATS is metadata-only until the next commit
        val head = catalog.snapshots(schema, table).lastOption
          .map(_.snapshotId).getOrElse(0L)
        val statRows = liveStats(schema, table)
        catalog.writeTableStats(schema, table, head, statRows)
        statRows.collectFirst {
          case (None, _, _, _, Some(rc), _, _) => rc.toLong
        }.getOrElse(0L)
      case graft.catalog.TruncateStmt(schema, table) =>
        requireCatalogTable(sqlText, schema, table)
        // TRUNCATE is METADATA-ONLY: the commit references no data files
        // and the removed-row count is the parquet-footer record-count sum
        // — no table scan, no rewrite, any table size. The pre-truncate
        // snapshot stays time-travel-visible like any CoW DML commit.
        catalog.truncateCounted(schema, table)._2
      case graft.catalog.CreateViewStmt(schema, view, select, orReplace) =>
        if (!catalog.schemaExists(schema)) catalog.createSchema(schema)
        // Trino validates a view's defining query at CREATE time — analyze
        // it (lazily planned, nothing executes) before persisting the text
        query(SqlStatement(select))
        try { catalog.createView(schema, view, select, orReplace); 0L }
        catch {
          case e: IllegalStateException => throw new GraftQueryException(sqlText, e.getMessage, e)
          case e: IllegalArgumentException => throw new GraftQueryException(sqlText, e.getMessage, e)
        }
      case graft.catalog.CreateMaterializedViewStmt(schema, view, select, ifNotExists) =>
        if (!catalog.schemaExists(schema)) catalog.createSchema(schema)
        if (catalog.isMaterializedView(schema, view)) {
          if (ifNotExists) 0L
          else throw new GraftQueryException(sqlText,
            s"Materialized view $schema.$view already exists")
        } else {
          val result = mvMaterialization(select)
          try {
            catalog.createMaterializedView(schema, view, select, result,
              referencedSources(select))
            0L
          } catch {
            case e: IllegalStateException =>
              throw new GraftQueryException(sqlText, e.getMessage, e)
            case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e)
          }
        }
      case graft.catalog.RefreshMaterializedViewStmt(schema, view) =>
        mvRefreshLock(schema, view).synchronized {
          val meta = catalog.materializedViewMeta(schema, view).getOrElse(
            throw new GraftQueryException(sqlText,
              s"Materialized view $schema.$view does not exist"))
          refreshIncremental(schema, view, meta).getOrElse {
            lastMvRefreshMode = "full"
            val refreshed = catalog.refreshMaterializedView(schema, view,
              mvMaterialization(meta._1), referencedSources(meta._1))
            // the refresh wrote and footer-scanned the data already — the
            // returned count is metadata arithmetic, not a second table scan
            catalog.snapshotRowCount(schema, view, refreshed)
          }
        }
      case graft.catalog.DropMaterializedViewStmt(schema, view, ifExists) =>
        if (!catalog.isMaterializedView(schema, view)) {
          if (ifExists) 0L
          else throw new GraftQueryException(sqlText,
            s"Materialized view $schema.$view does not exist")
        } else {
          catalog.dropTable(schema, view)
          mvRefreshLocks.remove(schema + "\u0000" + view) // no lock leak
          0L
        }
      case graft.catalog.DropViewStmt(schema, view, ifExists) =>
        if (!catalog.viewExists(schema, view)) {
          if (ifExists) 0L
          else throw new GraftQueryException(sqlText, s"View $schema.$view does not exist")
        } else { catalog.dropView(schema, view); 0L }
      case graft.catalog.DeleteStmt(schema, table, where, branchName) =>
        requireCatalogTable(sqlText, schema, table)
        val cond = where.map(parseCond(sqlText, _))
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        // affected-rows contract (Trino returns the deleted count): the
        // count happens inside the catalog's synchronized rewrite, so no
        // commit can interleave between the count and the delete
        branchCatalog(sqlText, schema, table, branchName)
          .deleteCounted(schema, table, cond)._2
      case graft.catalog.UpdateStmt(schema, table, sets, where, branchName) =>
        requireCatalogTable(sqlText, schema, table)
        val cond = where.map(parseCond(sqlText, _))
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        val setCols = sets.map { case (c, e) => (c, parseCond(sqlText, e)) }
        try branchCatalog(sqlText, schema, table, branchName)
          .updateCounted(schema, table, setCols, cond)._2
        catch { case e: IllegalArgumentException =>
          throw new GraftQueryException(sqlText, e.getMessage, e) }
      case m: graft.catalog.MergeStmt =>
        requireCatalogTable(sqlText, m.schema, m.table)
        // source: subquery text straight through the query surface; a table
        // name via SELECT * so catalog refs and temp views both resolve
        val src =
          if (m.sourceIsQuery) query(SqlStatement(m.source))
          else query(SqlStatement(s"SELECT * FROM ${m.source}"))
        val tAlias = m.targetAlias.getOrElse(m.table)
        val sAlias = m.sourceAlias.getOrElse(
          if (m.sourceIsQuery) "source" else m.source.split('.').last)
        val (matched, notMatched) = m.clauses.partition(_.matched)
        val mActions: Seq[graft.catalog.MergeAction] = matched.map { c =>
          val cond = c.cond.map(parseCond(sqlText, _))
          c.action match {
            case graft.catalog.MergeDeleteSpec => graft.catalog.MergeDeleteAction(cond)
            case graft.catalog.MergeUpdateSpec(sets) =>
              graft.catalog.MergeUpdateAction(cond,
                sets.map { case (col, e) => (col, parseCond(sqlText, e)) })
            case _: graft.catalog.MergeInsertSpec =>
              throw new GraftQueryException(sqlText, "WHEN MATCHED cannot INSERT")
          }
        }
        val nmActions = notMatched.map { c =>
          val cond = c.cond.map(parseCond(sqlText, _))
          c.action match {
            case graft.catalog.MergeInsertSpec(cols, values) =>
              graft.catalog.MergeInsertAction(cond, cols,
                values.map(parseCond(sqlText, _)))
            case _ =>
              throw new GraftQueryException(sqlText,
                "WHEN NOT MATCHED supports only INSERT")
          }
        }
        try catalog.mergeInto(m.schema, m.table, src, tAlias, sAlias,
          parseCond(sqlText, m.on), mActions, nmActions)._2
        catch {
          case e: IllegalArgumentException =>
            throw new GraftQueryException(sqlText, e.getMessage, e)
          case e: IllegalStateException =>
            throw new GraftQueryException(sqlText, e.getMessage, e)
        }
      case graft.catalog.AddColumnStmt(schema, table, column, dataType, ifNotExists) =>
        requireCatalogTable(sqlText, schema, table)
        val exists = catalog.declaredSchema(schema, table)
          .exists(_.fieldNames.exists(_.equalsIgnoreCase(column)))
        if (exists) {
          if (!ifNotExists)
            throw new GraftQueryException(sqlText,
              s"Column $column already exists in $schema.$table")
        } else catalog.addColumn(schema, table, column, dataType)
        0L
      case graft.catalog.DropColumnStmt(schema, table, column, ifExists) =>
        requireCatalogTable(sqlText, schema, table)
        val exists = catalog.declaredSchema(schema, table)
          .exists(_.fieldNames.exists(_.equalsIgnoreCase(column)))
        if (!exists) {
          if (!ifExists)
            throw new GraftQueryException(sqlText,
              s"Column $column does not exist in $schema.$table")
        } else {
          try catalog.dropColumn(schema, table, column)
          catch { case e: IllegalArgumentException =>
            throw new GraftQueryException(sqlText, e.getMessage, e) }
        }
        0L
      case graft.catalog.RenameColumnStmt(schema, table, from, to, ifExists) =>
        requireCatalogTable(sqlText, schema, table)
        val exists = catalog.declaredSchema(schema, table)
          .exists(_.fieldNames.exists(_.equalsIgnoreCase(from)))
        if (!exists) {
          if (!ifExists)
            throw new GraftQueryException(sqlText,
              s"Column $from does not exist in $schema.$table")
        } else {
          try catalog.renameColumn(schema, table, from, to)
          catch { case e: IllegalArgumentException =>
            throw new GraftQueryException(sqlText, e.getMessage, e) }
        }
        0L
      case graft.catalog.SetColumnTypeStmt(schema, table, column, dataType) =>
        requireCatalogTable(sqlText, schema, table)
        try { catalog.setColumnType(schema, table, column, dataType); 0L }
        catch { case e: IllegalArgumentException =>
          throw new GraftQueryException(sqlText, e.getMessage, e) }
      case graft.catalog.RenameTableStmt(schema, table, newSchema, newTable) =>
        requireCatalogTable(sqlText, schema, table)
        try { catalog.renameTable(schema, table, newSchema.getOrElse(schema), newTable); 0L }
        catch { case e: IllegalArgumentException =>
          throw new GraftQueryException(sqlText, e.getMessage, e) }
      case graft.catalog.CatalogRefStmt(proc, name, tables) =>
        try {
          proc match {
            case "create_catalog_branch" =>
              catalog.createCatalogBranch(name, tables); 0L
            case "publish_catalog_branch" =>
              catalog.publishCatalogBranch(name); 0L
            case "materialize_catalog_branch" =>
              catalog.materializeCatalogBranch(name); 0L
            case "merge_catalog_branch" =>
              catalog.mergeCatalogBranch(name); 0L
            case "drop_catalog_branch" =>
              catalog.dropCatalogBranch(name); 0L
            case "create_catalog_tag" =>
              catalog.createCatalogTag(name, tables); 0L
            case "drop_catalog_tag" =>
              catalog.dropCatalogTag(name); 0L
          }
        } catch {
          case e: graft.catalog.CatalogPublishConflictException =>
            throw new GraftQueryException(sqlText, e.getMessage, e)
          case e: IllegalArgumentException =>
            throw new GraftQueryException(sqlText, e.getMessage, e)
        }
      case graft.catalog.AlterExecuteStmt(schema, table, proc, args) =>
        // register_table / register_iceberg_table / migrate are the
        // procedures whose target must NOT exist yet
        if (proc != "register_table" && proc != "register_iceberg_table" &&
            proc != "migrate")
          requireCatalogTable(sqlText, schema, table)
        proc match {
          case "register_table" =>
            val loc = args.getOrElse("table_location",
              throw new GraftQueryException(sqlText,
                "register_table requires table_location => '<path>'"))
            try { catalog.registerTable(schema, table, loc); 0L }
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e) }
          case "register_iceberg_table" =>
            val loc = args.getOrElse("table_location",
              throw new GraftQueryException(sqlText,
                "register_iceberg_table requires table_location => '<path>'"))
            try {
              catalog.registerIcebergTable(schema, table, loc,
                args.get("metadata_file"))
              0L
            }
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e) }
          case "refresh_iceberg_table" =>
            try catalog.refreshIcebergTable(schema, table)
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e) }
          case "export_iceberg_table" =>
            val loc = args.getOrElse("table_location",
              throw new GraftQueryException(sqlText,
                "export_iceberg_table requires table_location => '<path>'"))
            try catalog.exportIcebergTable(schema, table, loc)
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e) }
          case "migrate" =>
            val loc = args.getOrElse("table_location",
              throw new GraftQueryException(sqlText,
                "migrate requires table_location => '<path>'"))
            try catalog.migrateTable(schema, table, loc)
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e) }
          case "unregister_table" =>
            try { catalog.unregisterTable(schema, table); 0L }
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e) }
          case "add_files" =>
            val loc = args.getOrElse("location",
              throw new GraftQueryException(sqlText,
                "add_files requires location => '<path>'"))
            try catalog.addFiles(schema, table, loc)
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e) }
          case "add_files_from_table" =>
            val st = args.getOrElse("table_name",
              throw new GraftQueryException(sqlText,
                "add_files_from_table requires table_name => '<table>'"))
            val ss = args.getOrElse("schema_name", schema)
            try catalog.addFilesFromTable(schema, table, ss, st)
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e) }
          case "optimize" =>
            catalog.compact(schema, table,
              args.get("file_count").map(_.toInt).getOrElse(1),
              args.get("__where").map(parseCond(sqlText, _)))
            0L
          case "optimize_manifests" | "rewrite_manifests" =>
            catalog.rewriteManifests(schema, table)
          case "expire_snapshots" =>
            // retention_threshold => '<n>d'/'<n>h'/'<n>m'/'<n>s' (Trino
            // spelling); everything older than now - threshold expires
            val retainMs = args.get("retention_threshold")
              .map(parseDuration(sqlText, _)).getOrElse(0L)
            catalog.expireSnapshots(schema, table,
              System.currentTimeMillis() - retainMs).length.toLong
          case "remove_orphan_files" =>
            catalog.removeOrphanFiles(schema, table).length.toLong
          case "drop_extended_stats" =>
            catalog.dropExtendedStats(schema, table); 0L
          case "rollback_to_snapshot" =>
            val id = args.getOrElse("snapshot_id",
              throw new GraftQueryException(sqlText,
                "rollback_to_snapshot requires snapshot_id => <id>")).toLong
            try { catalog.rollbackToSnapshot(schema, table, id); 0L }
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e) }
          case "rollback_to_timestamp" =>
            // timestamp => TIMESTAMP '2026-01-01 00:00:00' (or the bare
            // quoted literal) — resolved like FOR TIMESTAMP AS OF, UTC
            val raw = args.getOrElse("timestamp",
              throw new GraftQueryException(sqlText,
                "rollback_to_timestamp requires timestamp => TIMESTAMP '<ts>'"))
            val lit = raw.trim.replaceAll("(?i)^TIMESTAMP\\s+", "")
              .stripPrefix("'").stripSuffix("'").trim
            val ms =
              try java.time.LocalDateTime.parse(lit.replace(" ", "T"))
                .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
              catch { case e: java.time.format.DateTimeParseException =>
                throw new GraftQueryException(sqlText,
                  s"Malformed rollback_to_timestamp literal: '$lit'", e) }
            try { catalog.rollbackToTimestamp(schema, table, ms); 0L }
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sqlText, e.getMessage, e) }
          case "create_branch" | "drop_branch" | "create_tag" | "drop_tag" |
               "fast_forward" | "merge_branch" =>
            val name = args.getOrElse("name",
              throw new GraftQueryException(sqlText, s"$proc requires a ref name"))
            val snapId = args.get("snapshot_id").map(_.toLong)
            try {
              proc match {
                case "create_branch" => catalog.createBranch(schema, table, name, snapId); 0L
                case "drop_branch"   => catalog.dropBranch(schema, table, name); 0L
                case "create_tag"    => catalog.createTag(schema, table, name, snapId); 0L
                case "drop_tag"      => catalog.dropTag(schema, table, name); 0L
                case "fast_forward"  => catalog.fastForward(schema, table, name); 0L
                case "merge_branch"  => catalog.mergeBranch(schema, table, name)
              }
            } catch {
              case e: IllegalArgumentException =>
                throw new GraftQueryException(sqlText, e.getMessage, e)
              case e: graft.catalog.MergeConflictException =>
                throw new GraftQueryException(sqlText, e.getMessage, e)
            }
          case other =>
            throw new GraftQueryException(sqlText,
              s"Unsupported ALTER TABLE EXECUTE procedure: $other " +
                "(supported: optimize, optimize_manifests, expire_snapshots, " +
                "remove_orphan_files, rollback_to_snapshot, rollback_to_timestamp, create_branch, " +
                "drop_branch, create_tag, drop_tag, fast_forward, merge_branch, " +
                "add_files, add_files_from_table, register_table, unregister_table, " +
                "migrate, drop_extended_stats)")
        }
    }

  private def requireCatalogTable(sqlText: String, schema: String, table: String): Unit =
    if (!catalog.tableExists(schema, table))
      throw new GraftQueryException(sqlText, s"Table $schema.$table does not exist")

  /** Catalog view a DML statement commits through: the named branch
    * (`sch."t@branch"` operands) or main.
    */
  private def branchCatalog(sqlText: String, schema: String, table: String,
                            branchName: Option[String]): graft.catalog.SnapshotCatalog =
    branchName match {
      case None => catalog
      case Some(b) =>
        if (!catalog.branchExists(schema, table, b))
          throw new GraftQueryException(sqlText,
            s"Branch $b does not exist on $schema.$table")
        catalog.branch(b)
    }

  /** Parse a DML scalar/predicate expression via Catalyst, converting the
    * parse error into the engine's typed failure contract.
    */
  private def parseCond(sqlText: String, e: String): org.apache.spark.sql.Column =
    try {
      // Spark 4's Column defers expression parsing until the Column is
      // attached to a plan — parse eagerly so a malformed expression
      // surfaces HERE as the engine's typed error, not later inside the
      // catalog rewrite
      spark.sessionState.sqlParser.parseExpression(e)
      org.apache.spark.sql.functions.expr(e)
    } catch { case ex: Exception =>
      throw new GraftQueryException(sqlText, s"Malformed DML expression '$e': ${ex.getMessage}", ex)
    }

  /** `'7d'`-style retention durations (Trino's `retention_threshold`). */
  private def parseDuration(sqlText: String, s: String): Long = {
    val m = """(?i)^\s*(\d+)\s*(d|h|m|s)\s*$""".r.findFirstMatchIn(s).getOrElse(
      throw new GraftQueryException(sqlText, s"Malformed retention duration: '$s'"))
    m.group(1).toLong * (m.group(2).toLowerCase match {
      case "d" => 86400000L; case "h" => 3600000L; case "m" => 60000L; case _ => 1000L
    })
  }

  private val insertRe =
    """(?is)^\s*INSERT\s+INTO\s+(?:(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\s+VALUES\s+(.+)$""".r
  private val insertSelectRe =
    """(?is)^\s*INSERT\s+INTO\s+(?:(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\s+((?:SELECT|WITH)\s+.+)$""".r

  // Trino Iceberg's branch-write spelling: INSERT INTO sch."t@branch"
  // (write-audit-publish: write to a branch, validate, fast_forward) —
  // VALUES or SELECT source, committed against the BRANCH ref only
  private val insertBranchRe =
    """(?is)^\s*INSERT\s+INTO\s+(?:(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\.)?"([A-Za-z_]\w*)@([A-Za-z_]\w*)"\s+((?:VALUES|SELECT|WITH)\s+.+)$""".r

  /** `INSERT INTO [catalog.]<schema>.<table> VALUES (…),(…)` → snapshot
    * commit (a leading catalog qualifier, the reference's `iceberg.`, is
    * accepted and dropped). Literal rows are parsed by Catalyst
    * (`SELECT * FROM VALUES …`), cast positionally to the declared table
    * schema, and appended as one commit — each INSERT is one
    * time-travel-visible snapshot, exactly the reference's commit model
    * (AthenaClientTests.cs:351-364). The quoted `"t@branch"` form
    * commits to that BRANCH ref, leaving main untouched.
    */
  private def tryInsert(sqlText: String): Option[Long] = sqlText match {
    case insertBranchRe(schemaName0, tableName, branchName, source) =>
      val schemaName = Option(schemaName0).getOrElse(sessionSchema)
      if (!catalog.tableExists(schemaName, tableName)) None
      else {
        if (!catalog.branchExists(schemaName, tableName, branchName))
          throw new GraftQueryException(sqlText,
            s"Branch $branchName does not exist on $schemaName.$tableName")
        val src =
          if (source.trim.toUpperCase.startsWith("VALUES"))
            spark.sql(s"SELECT * FROM ${source.stripSuffix(";")}")
          else query(SqlStatement(source.stripSuffix(";")))
        Some(commitInsert(schemaName, tableName, src,
          catalog.branch(branchName)))
      }
    case insertRe(schemaName0, tableName, values) =>
      // an unqualified name resolves against the session schema
      val schemaName = Option(schemaName0).getOrElse(sessionSchema)
      if (catalog.tableExists(schemaName, tableName))
        Some(commitInsert(schemaName, tableName,
          spark.sql(s"SELECT * FROM VALUES ${values.stripSuffix(";")}")))
      else None
    case insertSelectRe(schemaName0, tableName, select) =>
      val schemaName = Option(schemaName0).getOrElse(sessionSchema)
      // INSERT INTO … SELECT: the source query goes through the full query
      // surface (catalog refs + time travel resolve inside it too)
      if (catalog.tableExists(schemaName, tableName))
        Some(commitInsert(schemaName, tableName, query(SqlStatement(select.stripSuffix(";")))))
      else None
    case _ => None
  }

  /** Cast a source frame positionally to the table's declared schema and
    * commit it as one snapshot; returns rows affected.
    */
  private def commitInsert(schemaName: String, tableName: String,
                           raw: DataFrame,
                           cat: graft.catalog.SnapshotCatalog = catalog): Long = {
    val declared = cat.declaredSchema(schemaName, tableName).getOrElse(
      throw new IllegalStateException(s"Table $schemaName.$tableName has no declared schema"))
    require(raw.schema.length == declared.length,
      s"INSERT arity ${raw.schema.length} != table arity ${declared.length}")
    val cast = raw.select(declared.fields.zipWithIndex.map { case (f, i) =>
      org.apache.spark.sql.functions.col(raw.columns(i)).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    val n = cast.count()
    cat.insert(schemaName, tableName, cast)
    n
  }

  /** Run a multi-statement SQL script exactly the way the reference's
    * stack runner feeds its seed scripts (TrinoIcebergStack.cs:152-197):
    * drop `--` comments to end-of-line (full-line AND trailing, but never
    * inside a string literal — a comment containing an apostrophe must
    * not poison the quote state either), split on statement-terminating
    * `;` (quote-aware — a `;` inside a string literal does not split),
    * execute each non-empty statement in order. Returns per-statement row
    * counts.
    */
  def executeScript(script: String): Seq[Long] = {
    val stmts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (!inQuote && c == '-' && i + 1 < script.length && script.charAt(i + 1) == '-') {
        while (i < script.length && script.charAt(i) != '\n') i += 1
      } else {
        if (c == '\'') inQuote = !inQuote
        if (c == ';' && !inQuote) { stmts += cur.toString; cur.clear() }
        else cur += c
        i += 1
      }
    }
    stmts += cur.toString
    stmts.map(_.trim).filter(_.nonEmpty).toSeq
      .map(s => executeNonQuery(SqlStatement(s)))
  }

  /** Parallel statement batch (reference TrinoIcebergStack.cs:233-257). */
  def executeBatch(stmts: Seq[SqlStatement]): Unit = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(stmts.map(s => Future(executeNonQuery(s)))), Duration.Inf)
  }

  /** UNLOAD (reference UnloadAsync, AthenaClient.cs:116-208). */
  def unload(stmt: SqlStatement, targetDir: String): UnloadResponse = {
    val resp = unloader.unload(query(stmt), targetDir)
    graft.logging.Log.info(log, "Unloaded {0} rows to {1}", resp.rowCount, resp.path)
    resp
  }

  // ---- catalog-table SQL integration ----

  /** Expose a catalog table (latest snapshot, resolved lazily at query time)
    * to the SQL surface as `<schema>_<table>`.
    */
  def registerTable(schema: String, table: String): Unit =
    catalog.readLatest(schema, table).createOrReplaceTempView(s"${schema}_$table")

  /** Register a plain DataFrame under a view name. */
  def registerView(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  // ---- catalog introspection SQL (Trino SHOW / DESCRIBE client surface) ----

  private val showSchemasRe =
    """(?is)^\s*SHOW\s+SCHEMAS\s*(?:LIKE\s+'([^']*)')?\s*;?\s*$""".r
  private val showCatalogsRe =
    """(?is)^\s*SHOW\s+CATALOGS\s*(?:LIKE\s+'([^']*)')?\s*;?\s*$""".r
  private val showTablesRe =
    """(?is)^\s*SHOW\s+TABLES\s*(?:(?:FROM|IN)\s+(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*))?\s*(?:LIKE\s+'([^']*)')?\s*;?\s*$""".r

  /** SQL LIKE pattern (%/_ wildcards) → anchored regex, literal-safe. */
  private def likeMatches(pattern: String, s: String): Boolean = {
    val rx = pattern.map {
      case '%' => ".*"
      case '_' => "."
      case c => java.util.regex.Pattern.quote(c.toString)
    }.mkString
    s.matches(rx)
  }
  private val describeRe =
    """(?is)^\s*(?:DESCRIBE|DESC|SHOW\s+COLUMNS\s+(?:FROM|IN))\s+(?:(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\s*;?\s*$""".r
  private val showCreateRe =
    """(?is)^\s*SHOW\s+CREATE\s+(TABLE|VIEW)\s+(?:(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\s*;?\s*$""".r
  private val showStatsRe =
    """(?is)^\s*SHOW\s+STATS\s+FOR\s+(?:(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\s*;?\s*$""".r

  /** SHOW SCHEMAS / SHOW TABLES / DESCRIBE against the snapshot catalog
    * (Trino's introspection statements). SHOW TABLES lists views too —
    * Trino behavior. Returns None for any other statement (the normal
    * query path takes over).
    */
  private def introspectionQuery(sql: String): Option[DataFrame] = {
    import spark.implicits._
    sql match {
      case showCatalogsRe(like) =>
        // exactly one catalog backs this engine — presented under the
        // reference's name (its SQL says iceberg.schema.table throughout)
        val all = Seq("iceberg")
        Some(Option(like).map(p => all.filter(likeMatches(p, _)))
          .getOrElse(all).toDF("catalog"))
      case showSchemasRe(like) =>
        val all = catalog.listSchemas()
        Some(Option(like).map(p => all.filter(likeMatches(p, _)))
          .getOrElse(all).toDF("schema_name"))
      case showTablesRe(sch0, like) =>
        val sch = Option(sch0).getOrElse(sessionSchema)
        val all = (catalog.listTables(sch) ++ catalog.listViews(sch)).sorted
        Some(Option(like).map(p => all.filter(likeMatches(p, _)))
          .getOrElse(all).toDF("table_name"))
      case describeRe(sch0, tbl)
          // a bare name the catalog doesn't own falls through to Spark
          // (DESCRIBE of a Spark temp view keeps working under USE)
          if sch0 != null ||
            catalog.tableExists(sessionSchema, tbl) ||
            catalog.viewExists(sessionSchema, tbl) =>
        val sch = Option(sch0).getOrElse(sessionSchema)
        val fields =
          if (catalog.tableExists(sch, tbl))
            catalog.declaredSchema(sch, tbl).map(_.fields.toSeq).getOrElse(Seq.empty)
              .filterNot(_.name.startsWith("__mv_"))
          else if (catalog.viewExists(sch, tbl))
            query(SqlStatement(catalog.viewSql(sch, tbl).get)).schema.fields.toSeq
          else throw new GraftQueryException(sql, s"Table or view $sch.$tbl does not exist")
        val colComments =
          if (catalog.tableExists(sch, tbl)) catalog.comments(sch, tbl)._2
          else Map.empty[String, String]
        // a materialized view surfaces its freshness as a trailing
        // metadata row: stale sources (if any) are named in the comment,
        // and the refresh strategy the definition's SHAPE admits (what a
        // REFRESH would do on an append-only history; non-append commits
        // still recompute) as a second row
        val mvRow =
          if (!catalog.isMaterializedView(sch, tbl)) Nil
          else {
            val stale = catalog.staleSources(sch, tbl)
            val meta = catalog.materializedViewMeta(sch, tbl).get
            val srcs = meta._2.keySet.flatMap(_.split('.') match {
              case Array(s, t) => Some((s, t)); case _ => None
            })
            val strategy = MvIncremental.classify(spark, meta._1, srcs,
                sessionSchema) match {
              case Some(MvIncremental.MvProjectShape) => "incremental-append"
              case Some(_: MvIncremental.MvAggShape)  => "incremental-merge"
              case None                               => "full-recompute"
            }
            Seq(
              ("# materialized_view",
                if (stale.isEmpty) "fresh" else "stale", false,
                if (stale.isEmpty) null else s"stale sources: ${stale.mkString(", ")}"),
              ("# refresh_strategy", strategy, false,
                "strategy for append-only source histories"))
          }
        // an Iceberg-attached table surfaces its source + sync posture:
        // one KB-scale read of the foreign metadata tells the operator
        // whether the attachment lags the source, without a refresh
        val iceRow =
          if (!catalog.tableExists(sch, tbl)) Nil
          else catalog.icebergSourceOf(sch, tbl).toSeq.flatMap { src =>
            val srcRow = ("# iceberg_source", src, false,
              "read-only attachment; CALL system.refresh_iceberg_table to sync")
            val syncRow =
              try catalog.icebergSyncLag(sch, tbl).map {
                case (head, srcHead, behind) =>
                  ("# iceberg_sync",
                    if (behind == 0L) "up to date"
                    else s"behind by $behind snapshot(s)", false,
                    s"imported head $head; source head ${srcHead.getOrElse("-")}")
              }.toSeq
              catch { case scala.util.control.NonFatal(e) =>
                Seq(("# iceberg_sync", "source unreachable", false,
                  String.valueOf(e.getMessage).take(120)))
              }
            srcRow +: syncRow
          }
        Some((fields.map(f => (f.name, f.dataType.sql.toLowerCase, f.nullable,
            colComments.get(f.name.toLowerCase).orNull)) ++ mvRow ++ iceRow)
          .toDF("column_name", "data_type", "nullable", "comment"))
      case showCreateRe(kind, sch0, tbl) if kind.equalsIgnoreCase("TABLE") =>
        val sch = Option(sch0).getOrElse(sessionSchema)
        val columns = catalog.declaredSchema(sch, tbl).getOrElse(
          throw new GraftQueryException(sql, s"Table $sch.$tbl does not exist"))
        // COMMENT clauses round-trip the catalog state (Trino includes
        // table and column comments in SHOW CREATE TABLE output)
        val (tblComment, colComments) = catalog.comments(sch, tbl)
        def q(v: String) = s"'${v.replace("'", "''")}'"
        val cols = columns.fields.map { f =>
          val c = colComments.get(f.name.toLowerCase)
            .map(v => s" COMMENT ${q(v)}").getOrElse("")
          s"   ${f.name} ${trinoType(f.dataType)}$c"
        }.mkString(",\n")
        val parts = catalog.partitionSpec(sch, tbl)
        val sorted = catalog.sortSpec(sch, tbl)
        val props = Seq("   format = 'PARQUET'") ++
          (if (catalog.formatVersion(sch, tbl) == 2)
            Seq("   format_version = 2")
          else Nil) ++
          (if (parts.nonEmpty)
            Seq(s"   partitioning = ARRAY[${parts.map(p => s"'$p'").mkString(", ")}]")
          else Nil) ++
          (if (sorted.nonEmpty)
            Seq(s"   sorted_by = ARRAY[${sorted.map(p => s"'$p'").mkString(", ")}]")
          else Nil) ++ {
            val blooms = catalog.bloomColumns(sch, tbl)
            if (blooms.nonEmpty)
              Seq("   parquet_bloom_filter_columns = " +
                s"ARRAY[${blooms.map(p => s"'$p'").mkString(", ")}]")
            else Nil
          }
        val commentClause = tblComment.map(v => s"\nCOMMENT ${q(v)}").getOrElse("")
        val ddl = s"CREATE TABLE $sch.$tbl (\n$cols\n)$commentClause" +
          s"\nWITH (\n${props.mkString(",\n")}\n)"
        Some(Seq(ddl).toDF("create_table"))
      case showCreateRe(_, sch0, v) => // VIEW
        val sch = Option(sch0).getOrElse(sessionSchema)
        val text = catalog.viewSql(sch, v).getOrElse(
          throw new GraftQueryException(sql, s"View $sch.$v does not exist"))
        Some(Seq(s"CREATE VIEW $sch.$v AS $text").toDF("create_view"))
      case showStatsRe(sch0, tbl) =>
        val sch = Option(sch0).getOrElse(sessionSchema)
        if (!catalog.tableExists(sch, tbl))
          throw new GraftQueryException(sql, s"Table $sch.$tbl does not exist")
        Some(showStats(sch, tbl))
      case _ => None
    }
  }

  /** SHOW STATS FOR t (Trino's stats surface): one row per column with
    * approximate NDV, null fraction, and low/high values, plus the
    * summary row carrying row_count and data_size — computed in a SINGLE
    * aggregation pass over the current snapshot (every per-column
    * statistic is one agg expression in one job), with byte size and the
    * exact row count from the parquet footers ($files metadata, no
    * second scan). Columns of non-atomic type (arrays/structs/binary)
    * report only their null fraction, like engines that skip unsupported
    * stats.
    */
  private def showStats(sch: String, tbl: String): DataFrame = {
    import spark.implicits._
    // persisted ANALYZE stats matching the current head serve WITHOUT any
    // scan — the 100 TB contract: collect once, answer from metadata
    // until the table changes (Trino Iceberg's ANALYZE/Puffin model)
    val head = catalog.snapshots(sch, tbl).lastOption.map(_.snapshotId).getOrElse(0L)
    val rows = catalog.readTableStats(sch, tbl) match {
      case Some((snap, persisted)) if snap == head => persisted
      case _ => liveStats(sch, tbl)
    }
    rows.map { case (cn, ds, ndv, nf, rc, lo, hi) =>
      (cn.orNull, ds, ndv, nf, rc, lo, hi)
    }.toDF("column_name", "data_size", "distinct_values_count",
      "nulls_fraction", "row_count", "low_value", "high_value")
  }

  /** One aggregation pass over the current snapshot → SHOW STATS rows
    * (every per-column statistic is one agg expression in one job), byte
    * size and exact row count from the manifest/footer metadata.
    */
  private def liveStats(sch: String, tbl: String): Seq[catalog.StatsRow] = {
    import org.apache.spark.sql.functions._
    val df = catalog.readLatest(sch, tbl)
    val atomic = df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType |
             org.apache.spark.sql.types.BinaryType => f.name -> false
        case _ => f.name -> true
      }
    }.toMap
    val aggExprs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val nulls = sum(when(c.isNull, 1L).otherwise(0L)).as(s"__n_${f.name}")
      if (atomic(f.name))
        Seq(nulls,
          approx_count_distinct(c).as(s"__d_${f.name}"),
          min(c).cast("string").as(s"__lo_${f.name}"),
          max(c).cast("string").as(s"__hi_${f.name}"))
      else Seq(nulls)
    } :+ count(lit(1)).as("__rows")
    val r = df.agg(aggExprs.head, aggExprs.tail.toIndexedSeq: _*).collect()(0)
    val rows = r.getAs[Long]("__rows")
    val dataSize = catalog.filesMeta(sch, tbl)
      .agg(sum(col("file_size_in_bytes"))).collect()(0) match {
        case row if row.isNullAt(0) => 0L
        case row => row.getLong(0)
      }
    df.schema.fields.map { f =>
      val nulls = r.getAs[Long](s"__n_${f.name}")
      val frac = if (rows == 0) 0.0 else nulls.toDouble / rows
      if (atomic(f.name))
        (Some(f.name), Option.empty[Double],
          Option(r.getAs[Long](s"__d_${f.name}")).map(_.toDouble),
          Some(frac), Option.empty[Double],
          Option(r.getAs[String](s"__lo_${f.name}")),
          Option(r.getAs[String](s"__hi_${f.name}")))
      else (Some(f.name), Option.empty[Double], Option.empty[Double], Some(frac),
        Option.empty[Double], Option.empty[String], Option.empty[String])
    }.toSeq :+ ((Option.empty[String], Some(dataSize.toDouble), Option.empty[Double],
      Option.empty[Double], Some(rows.toDouble),
      Option.empty[String], Option.empty[String]))
  }

  /** Spark type → Trino type spelling (the inverse of DdlParser.sparkType;
    * lossy pairs round-trip to the canonical Trino name).
    */
  private def trinoType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => "varchar"
      case LongType => "bigint"
      case IntegerType => "integer"
      case ShortType => "smallint"
      case ByteType => "tinyint"
      case DoubleType => "double"
      case FloatType => "real"
      case BooleanType => "boolean"
      case BinaryType => "varbinary"
      case DateType => "date"
      case TimestampType => "timestamp(6)"
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case other => other.sql.toLowerCase
    }
  }

  // ---- metadata tables in SQL (Trino Iceberg `"t$snapshots"` family) ----

  /** `FROM [cat.]sch."t$kind"` (Trino quoting) or the unquoted spelling —
    * both resolve to the catalog's metadata tables. Must run BEFORE
    * [[rewriteCatalogRefs]]: the unquoted form's `sch.t` prefix would
    * otherwise be swallowed by the data-table rewrite.
    */
  private val metadataRefRe =
    """(?i)\b(FROM|JOIN)\s+(?:(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\.)?("?)([A-Za-z_]\w*)\$(\w+)\3""".r

  private[graft] def rewriteMetadataRefs(sql: String): String = {
    val spans = literalSpans(sql)
    metadataRefRe.replaceAllIn(sql, m => {
      val (kw, sch, tbl, kind) = (m.group(1),
        // unqualified `t$kind` resolves against the session schema, like
        // every other bare name under USE
        Option(m.group(2)).getOrElse(sessionSchema), m.group(4), m.group(5))
      if (!overlapsLiteral(spans, m.start, m.end) && catalog.tableExists(sch, tbl)) {
        val view = s"_meta_${sch}_${tbl}_${kind.toLowerCase}_${nameTag(sch, tbl)}"
        try catalog.metadataTable(sch, tbl, kind).createOrReplaceTempView(view)
        catch { case e: IllegalArgumentException =>
          throw new GraftQueryException(sql, e.getMessage, e) }
        java.util.regex.Matcher.quoteReplacement(s"$kw $view")
      } else java.util.regex.Matcher.quoteReplacement(m.matched)
    })
  }

  // ---- catalog-qualified names in SQL ----

  private val catalogRefRe =
    """(?i)\b(?:FROM|JOIN)\s+((?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\.([A-Za-z_]\w*))""".r

  /** Character spans (start inclusive, end exclusive) covered by
    * single-quoted string literals, scanned with the same quote toggling
    * as [[executeScript]]. An SQL-escaped quote (`''`) scans as two
    * adjacent spans whose union still covers the whole literal — exactly
    * what the overlap test needs. Both regex rewrites skip any match
    * overlapping one of these spans, so literal text like
    * `SELECT 'FROM demo.t'` is never rewritten (round-3 verdict #7).
    */
  private def literalSpans(sql: String): Seq[(Int, Int)] = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var inQuote = false
    var start = -1
    var i = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        if (!inQuote) { inQuote = true; start = i }
        else { inQuote = false; spans += ((start, i + 1)) }
      }
      i += 1
    }
    if (inQuote) spans += ((start, sql.length)) // unterminated — mask to end
    spans.toSeq
  }

  private def overlapsLiteral(spans: Seq[(Int, Int)], start: Int, end: Int): Boolean =
    spans.exists { case (a, b) => start < b && end > a }

  /** Trino NULL-ordering parity: "The default null ordering is NULLS
    * LAST, regardless of the ordering direction" (Trino docs, SELECT —
    * DuckDB's default agrees); Spark defaults to NULLS FIRST on ASC and
    * NULLS LAST on DESC, so a nullable ascending sort key through the
    * SQL surface would silently order Trino-divergently. Every ORDER BY
    * item WITHOUT an explicit NULLS clause gets NULLS LAST appended
    * before the text reaches spark.sql. Token-aware textual pass: string
    * literals mask, parens nest (a subquery's own ORDER BY is handled by
    * its own regex match), and an item ends at a top-level comma, a
    * clause terminator (LIMIT/OFFSET/FETCH, set ops, a window frame's
    * ROWS/RANGE/GROUPS), a closing paren, a semicolon, or end of text.
    */
  private[graft] def rewriteNullOrdering(sql: String): String = {
    val spans = literalSpans(sql)
    // quoted identifiers (`"my order by col"`) are opaque to the ORDER
    // BY regex too — masked HERE only (the FROM/$-table rewrites resolve
    // quoted names on purpose, so literalSpans itself must not change)
    val idSpans = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0
      while (i < sql.length) {
        spans.find { case (a, b) => i >= a && i < b } match {
          case Some((_, b)) => i = b
          case None =>
            val c = sql.charAt(i)
            if (c == '"' || c == '`') {
              val close = sql.indexOf(c, i + 1)
              val end = if (close < 0) sql.length else close + 1
              buf += ((i, end)); i = end
            } else i += 1
        }
      }
      buf.toSeq
    }
    val ms = "(?i)\\bORDER\\s+BY\\b".r.findAllMatchIn(sql)
      .filterNot(m => overlapsLiteral(spans ++ idSpans, m.start, m.end)).toList
    if (ms.isEmpty) return sql
    val terminators = Set("limit", "offset", "fetch", "rows", "range",
      "groups", "union", "intersect", "except", "minus")
    val inserts = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    for (m <- ms) {
      var i = m.end
      var depth = 0
      var itemEnd = -1 // position AFTER the item's last non-ws char
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      def endItem(): Unit = {
        if (itemEnd >= 0 && !toks.contains("nulls"))
          inserts += ((itemEnd, " NULLS LAST"))
        toks.clear(); itemEnd = -1
      }
      var done = false
      while (i < sql.length && !done) {
        spans.find { case (a, b) => i >= a && i < b } match {
          case Some((_, b)) => i = b; itemEnd = i // a literal is content
          case None =>
            val c = sql.charAt(i)
            if (c == '(') { depth += 1; i += 1; itemEnd = i }
            else if (c == ')') {
              if (depth == 0) { endItem(); done = true }
              else { depth -= 1; i += 1; itemEnd = i }
            }
            else if (c == ',' && depth == 0) { endItem(); i += 1 }
            else if (c == ';' && depth == 0) { endItem(); done = true }
            else if (c.isWhitespace) i += 1
            else if (c == '"' || c == '`') { // quoted identifier: opaque token
              val close = sql.indexOf(c, i + 1)
              i = if (close < 0) sql.length else close + 1
              if (depth == 0) toks += "_quoted_"
              itemEnd = i
            }
            else if (c.isLetter || c == '_') {
              val ws = i
              while (i < sql.length &&
                (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
              val w = sql.substring(ws, i).toLowerCase(java.util.Locale.ROOT)
              // a terminator word ends the clause only AFTER the item
              // has content — as the item's first token it IS the item
              // (a column literally named `rows`/`range` still rewrites)
              if (depth == 0 && terminators.contains(w) &&
                  (toks.nonEmpty || itemEnd >= 0)) { endItem(); done = true }
              else { if (depth == 0) toks += w; itemEnd = i }
            }
            else { i += 1; itemEnd = i }
        }
      }
      if (!done) endItem()
    }
    if (inserts.isEmpty) return sql
    val sb = new StringBuilder(sql)
    inserts.sortBy(-_._1).foreach { case (at, txt) => sb.insert(at, txt) }
    sb.toString
  }

  /** Resolve `FROM/JOIN [catalog.]schema.table` references against the
    * snapshot catalog, so the reference's query SQL runs verbatim
    * (`SELECT … FROM iceberg.common_test_data.shared_data`,
    * TrinoClientIntegrationTests.cs:40-120) with no registerTable step.
    * Each match that names an existing catalog table is swapped for a temp
    * view over its latest snapshot, resolved lazily at query time; names
    * that don't resolve (Spark temp views, `database.table` in Spark's own
    * catalog) pass through untouched, as does anything inside a string
    * literal ([[literalSpans]]). Quoted/backticked identifiers are out of
    * scope — the reference's own SQL never emits them (its DDL and queries
    * use bare identifiers throughout). Runs AFTER rewriteTimeTravel, which
    * consumes the `FOR TIMESTAMP AS OF` form first.
    */
  /** Per-thread view-expansion depth: a catalog view's defining SQL goes
    * back through [[query]], which rewrites again — views-on-views nest
    * one level per hop, and a definition cycle would otherwise recurse
    * forever. 16 levels is far beyond any sane view stack.
    */
  private val viewDepth = ThreadLocal.withInitial[Integer](() => 0)

  /** Per-thread source substitution for incremental MV refresh: while a
    * definition replays over its append delta, the ONE overridden name
    * resolves to the delta DataFrame instead of the table's latest
    * snapshot — the definition text goes through [[query]]'s ordinary
    * rewrite machinery unchanged, so literals, casing, and bare-name
    * resolution behave exactly as the full-recompute path.
    */
  private val mvDeltaOverride =
    ThreadLocal.withInitial[Map[(String, String), DataFrame]](() => Map.empty)

  /** Per-invocation suffix for the delta temp views: temp-view names are
    * session-GLOBAL while the override map is thread-local, so two
    * concurrent refreshes replaying over the same source would otherwise
    * fight over one `_mvdelta_…` name (same-MV refreshes are additionally
    * serialized by [[mvRefreshLock]], but different MVs sharing a source
    * are not).
    */
  private val mvDeltaNonce = ThreadLocal.withInitial[Long](() => 0L)
  private val mvDeltaCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  private def withMvDelta[T](overrides: Map[(String, String), DataFrame])(f: => T): T = {
    mvDeltaOverride.set(overrides)
    mvDeltaNonce.set(mvDeltaCounter.incrementAndGet())
    try f finally {
      // the replay is done: drop this invocation's delta views rather
      // than leaking one temp view per refresh into the session
      overrides.keys.foreach { case (s, t) =>
        spark.catalog.dropTempView(s"_mvdelta_${s}_${t}_${nameTag(s, t)}_${mvDeltaNonce.get}")
      }
      mvDeltaOverride.remove()
      mvDeltaNonce.remove()
    }
  }

  /** One lock object per MV: REFRESH is serialized per view — the
    * incremental path spans several independently-synchronized catalog
    * calls (read meta → read deltas → commit → advance meta) and its
    * append commit is not idempotent, so two racing refreshes of the
    * same MV could double-append one delta.
    */
  /** Distinct-key cap for the join-leg full-side prune: below it the
    * delta's keys collect to an IN list (pushable to the manifest bounds
    * tier → file skipping); above it the plain full-scan join is the
    * better plan and the prune is skipped.
    */
  private val MvJoinPruneMaxKeys = 1000

  /** Most sources an incrementally-refreshed join MV may record: the
    * telescoping decomposition is exact for any N, but each leg joins
    * all N sources — N legs × N-way joins grows quadratic in source
    * reads, and past the typical fact ⋈ dim1 ⋈ dim2 ⋈ dim3 star a
    * recompute is usually the better plan anyway.
    */
  private val MvStarMaxSources = 4

  private val mvRefreshLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // NUL-joined key (no identifier can contain it — same convention as
  // nameTag), so (a, "b c") and ("a b", c) never share a lock
  private def mvRefreshLock(schema: String, view: String): Object =
    mvRefreshLocks.computeIfAbsent(schema + "\u0000" + view, _ => new Object)

  /** How the last REFRESH MATERIALIZED VIEW executed: `full`,
    * `incremental-append`, `incremental-merge`, or `noop` — observability
    * for specs and operators (the SQL surface is strategy-transparent).
    */
  @volatile private[graft] var lastMvRefreshMode: String = ""

  /** Resolve `sch.tbl` against the snapshot catalog: a data table becomes
    * a temp view over its latest snapshot; a catalog view expands its
    * defining SQL (depth-guarded). None when the catalog doesn't own the
    * name. Shared by the qualified- and bare-name rewrites.
    */
  private def resolveCatalogName(sql: String, sch: String, tbl: String): Option[String] =
    if (mvDeltaOverride.get.contains((sch, tbl))) {
      val view = s"_mvdelta_${sch}_${tbl}_${nameTag(sch, tbl)}_${mvDeltaNonce.get}"
      mvDeltaOverride.get()((sch, tbl)).createOrReplaceTempView(view)
      Some(view)
    } else if (catalog.tableExists(sch, tbl)) {
      val view = s"_cat_${sch}_${tbl}_${nameTag(sch, tbl)}"
      concealMv(catalog.readLatest(sch, tbl)).createOrReplaceTempView(view)
      Some(view)
    } else if (catalog.viewExists(sch, tbl)) {
      if (viewDepth.get() >= 16)
        throw new GraftQueryException(sql,
          s"View expansion exceeded depth 16 at $sch.$tbl — definition cycle?")
      val view = s"_catv_${sch}_${tbl}_${nameTag(sch, tbl)}"
      viewDepth.set(viewDepth.get() + 1)
      try query(SqlStatement(catalog.viewSql(sch, tbl).get)).createOrReplaceTempView(view)
      finally viewDepth.set(viewDepth.get() - 1)
      Some(view)
    } else None

  /** Catalog tables a query's text references with their CURRENT head
    * snapshot ids — what a materialized view records at (re)fresh time
    * so staleness is decidable later. Same reference detection as the
    * rewrite passes (qualified + session-schema bare names, string
    * literals excluded).
    */
  private def referencedSources(sql: String): Map[String, Long] = {
    val spans = literalSpans(sql)
    val qualified = catalogRefRe.findAllMatchIn(sql).collect {
      case m if !overlapsLiteral(spans, m.start, m.end) => (m.group(2), m.group(3))
    }
    val bare = bareRefRe.findAllMatchIn(sql).collect {
      case m if !overlapsLiteral(spans, m.start, m.end) => (sessionSchema, m.group(2))
    }
    (qualified ++ bare).toSeq.distinct.collect {
      case (sch, tbl) if catalog.tableExists(sch, tbl) =>
        s"$sch.$tbl" -> catalog.snapshots(sch, tbl).lastOption
          .map(_.snapshotId).getOrElse(0L)
    }.toMap
  }

  /** Incremental REFRESH MATERIALIZED VIEW — attempted first, transparent
    * fallback to full recompute (None). Eligible when the definition is
    * incrementally maintainable ([[MvIncremental.classify]]), every
    * source's commits since its recorded snapshot are all append-only
    * ([[SnapshotCatalog.appendsBetween]] throws otherwise), and the
    * recorded snapshots still exist (expire may have dropped them).
    *
    * Cost at scale: the delta replay scans ONLY files appended since the
    * last refresh; the merge re-aggregates `materialized ∪ partial` —
    * O(|MV| + |delta|) for aggregates, O(|delta|) append for
    * select-project-filter. A 100 TB source with a 10 GB day of appends
    * refreshes for the price of the 10 GB, where the recompute path
    * re-scans the 100 TB.
    *
    * Multi-source inner-join shape (fact ⋈ dim, and the fact ⋈ dim1 ⋈
    * dim2 star up to [[MvStarMaxSources]] sources): the new join rows
    * decompose by the telescoping identity — leg i joins
    * `S1_old ⋈ … ⋈ S(i-1)_old ⋈ ΔSi ⋈ S(i+1)_new ⋈ … ⋈ SN_new`
    * (legs disjoint by the FIRST source whose row is new) — one
    * definition replay per NON-EMPTY leg. The star steady state — a
    * huge append-only fact, dimensions that rarely move — costs one
    * delta-scan join per refresh (empty dim deltas contribute no leg);
    * when a dimension does move, its leg re-scans the fact once, pruned
    * to the delta's equi-join keys where they fit an IN list — inherent
    * to exact join maintenance (a new dim row may match arbitrarily old
    * fact rows).
    */
  private def refreshIncremental(schema: String, view: String,
                                 meta: (String, Map[String, Long])): Option[Long] = {
    val (defSql, recorded) = meta
    if (recorded.isEmpty || recorded.size > MvStarMaxSources) return None
    val srcs: Seq[((String, String), Long)] = recorded.toSeq.map {
      case (key, fromId) => key.split('.') match {
        case Array(s, t) => ((s, t), fromId)
        case _ => return None
      }
    }
    if (!srcs.forall { case ((s, t), _) => catalog.tableExists(s, t) }) return None
    // incarnation check: snapshot ids restart at 1 on drop/recreate, so a
    // recorded (source, snapshot-id) pair only names a reconstructible
    // delta when the source is still the SAME incarnation the MV
    // recorded. Unknown/missing identities (metas written before
    // identities existed) also recompute — which rewrites the meta with
    // identities, so the cost is one full refresh per legacy MV.
    val recordedIds = catalog.materializedViewSourceIds(schema, view)
    if (!srcs.forall { case ((s, t), _) =>
      recordedIds.get(s"$s.$t").contains(catalog.tableIdentity(s, t)) }) return None
    val shape = MvIncremental.classify(spark, defSql,
      srcs.map(_._1).toSet, sessionSchema).getOrElse(return None)
    // avg measures maintain through hidden sum/count partials: the
    // stored table must already CARRY them (written by an avg-aware
    // create/full-refresh) and every avg output must be double (the
    // only type whose merge-divide reproduces Spark's Average exactly;
    // decimal avg has its own division/rounding semantics) — anything
    // else recomputes
    val aggOutputs: Seq[MvIncremental.MvOut] = shape match {
      case MvIncremental.MvAggShape(o) => o
      case _ => Nil
    }
    val hasAvg = aggOutputs.contains(MvIncremental.MvAvg)
    if (hasAvg) {
      val mvF = catalog.declaredSchema(schema, view).map(_.fields).getOrElse(return None)
      val nAvg = aggOutputs.count(_ == MvIncremental.MvAvg)
      if (mvF.length != aggOutputs.length + 2 * nAvg) return None
      val typesOk = aggOutputs.zipWithIndex.forall {
        case (MvIncremental.MvAvg, i) =>
          mvF(i).dataType == org.apache.spark.sql.types.DoubleType
        case _ => true
      }
      if (!typesOk) return None
    }
    val heads = srcs.map { case (st, fromId) =>
      (st, fromId, catalog.snapshots(st._1, st._2)
        .lastOption.map(_.snapshotId).getOrElse(0L))
    }
    def currentCount(): Long =
      catalog.snapshots(schema, view).lastOption
        .map(catalog.snapshotRowCount(schema, view, _)).getOrElse(0L)
    if (heads.forall { case (_, fromId, head) => head == fromId }) {
      lastMvRefreshMode = "noop" // already fresh: nothing to commit
      return Some(currentCount())
    }
    val deltas =
      try heads.map { case (st, fromId, head) =>
        // emptiness answered from manifest metadata — zero Spark jobs on
        // the hot "did anything land" question; a legacy commit without
        // entries (count unknowable) falls back to a probe of the delta
        val empty = catalog.appendedRowCountBetween(st._1, st._2, fromId, head) match {
          case Some(n) => n == 0L
          case None => catalog.appendsBetween(st._1, st._2, fromId, head).isEmpty
        }
        (st, fromId, head, empty)
      }
      catch {
        // non-append commits in range, or a recorded snapshot expired —
        // both mean the delta is not reconstructible: recompute
        case _: IllegalStateException => return None
        case _: IllegalArgumentException => return None
      }
    val newSources = heads.map { case ((s, t), _, head) => s"$s.$t" -> head }.toMap
    if (deltas.forall(_._4)) { // sources advanced but appended no rows
      lastMvRefreshMode = "noop"
      catalog.advanceMaterializedViewSources(schema, view, newSources)
      return Some(currentCount())
    }
    def deltaOf(st: (String, String), fromId: Long, head: Long): DataFrame =
      catalog.appendsBetween(st._1, st._2, fromId, head)
    /** Prune a join leg's FULL-side read to the delta's equi-join key
      * values: any full-side row joining a delta row must share its key,
      * so restricting to the delta's (small, collected) key set is exact
      * for the inner join the classifier admits — and the pushed IN
      * filter reaches the manifest-bounds tier, so a 5-row dim append
      * skips the fact table's files wholesale instead of re-scanning
      * them. Past [[MvJoinPruneMaxKeys]] distinct keys the full-scan
      * join is the right plan anyway; NULL delta keys can never
      * equi-match, so they drop from the IN list (all-null → the leg is
      * provably empty and the full side prunes to nothing).
      */
    def pruneFull(full: DataFrame, fullSt: (String, String),
                  delta: DataFrame, deltaSt: (String, String),
                  keyPairs: Seq[(((String, String), String), ((String, String), String))])
        : DataFrame = {
      import org.apache.spark.sql.functions.{col, lit}
      val pairs = keyPairs.flatMap {
        case ((s1, c1), (s2, c2)) if s1 == fullSt && s2 == deltaSt => Some((c1, c2))
        case ((s1, c1), (s2, c2)) if s2 == fullSt && s1 == deltaSt => Some((c2, c1))
        case _ => None
      }
      pairs.foldLeft(full) { case (df, (fullCol, deltaCol)) =>
        val vals = delta.select(col(deltaCol)).distinct()
          .limit(MvJoinPruneMaxKeys + 1).collect().map(_.get(0))
        if (vals.length > MvJoinPruneMaxKeys) df
        else {
          val nonNull = vals.filter(_ != null).toSeq
          if (nonNull.isEmpty) df.filter(lit(false))
          else df.filter(col(fullCol).isInCollection(nonNull))
        }
      }
    }
    val keyPairs =
      if (deltas.size >= 2)
        MvIncremental.equiJoinKeys(spark, defSql, srcs.map(_._1).toSet, sessionSchema)
      else Nil
    // one replay runner for both strategies: the plain path substitutes
    // through the temp-view machinery; the avg path runs the
    // plan-surgery replay that appends the hidden sum/count partials
    def runDef(m: Map[(String, String), DataFrame]): DataFrame =
      if (!hasAvg) withMvDelta(m)(query(SqlStatement(defSql)))
      else MvIncremental.replayAugmented(spark, defSql, m, sessionSchema, aggOutputs)
        .getOrElse(throw new GraftQueryException(defSql,
          "augmented avg replay failed to analyze"))
    val partial =
      try {
        // telescoping legs: leg i replays the definition with ΔSi for
        // source i, the OLD state (recorded snapshot) for sources before
        // it, and the NEW head for sources after it — each full side
        // pruned to the delta's equi-join keys. deltas.size == 1
        // degenerates to the single replay over the delta.
        val legs = deltas.zipWithIndex.flatMap {
          case ((stI, fromI, headI, emptyI), i) =>
            if (emptyI) None
            else Some {
              val dI = deltaOf(stI, fromI, headI)
              runDef(deltas.zipWithIndex.map {
                case ((stJ, fromJ, headJ, _), j) =>
                  if (j == i) stJ -> dI
                  else stJ -> pruneFull(
                    catalog.readVersionConformed(stJ._1, stJ._2,
                      if (j < i) fromJ else headJ),
                    stJ, dI, stI, keyPairs)
              }.toMap)
            }
        }
        legs.reduce(_.unionByName(_))
      }
      catch {
        // a replay that no longer analyzes (e.g. the definition uses a
        // column added after the pinned old state) — recompute is always
        // sound, so fall back rather than fail the refresh. The replay
        // runs through query(), which re-throws AnalysisException as
        // GraftQueryException — catch BOTH (catching only the former was
        // dead code and failed the refresh instead of falling back).
        case _: org.apache.spark.sql.AnalysisException => return None
        case _: GraftQueryException => return None
      }
    // the replay's shape must still BE the MV's shape: a definition like
    // `SELECT *` re-planned after ADD COLUMN produces extra columns the
    // materialized table does not declare — recompute (which re-derives
    // the stored schema) is the evolution-correct path, not a mismatched
    // append/merge
    val mvFields = catalog.readLatest(schema, view).schema.fields
    if (partial.schema.fields.length != mvFields.length ||
        !partial.schema.fields.zip(mvFields).forall {
          case (p, m) => p.name.equalsIgnoreCase(m.name) }) return None
    val snap = shape match {
      case MvIncremental.MvProjectShape =>
        lastMvRefreshMode = "incremental-append"
        catalog.refreshMaterializedViewAppend(schema, view, partial, newSources)
      case MvIncremental.MvAggShape(outputs) =>
        lastMvRefreshMode = "incremental-merge"
        val merged = mergePartials(catalog.readLatest(schema, view),
          partial, outputs)
        catalog.refreshMaterializedView(schema, view, merged, newSources)
    }
    Some(catalog.snapshotRowCount(schema, view, snap))
  }

  /** The frame CREATE MATERIALIZED VIEW / full REFRESH materializes for
    * a definition: the plain query result — or, for an incrementally-
    * maintainable aggregate with avg measures whose visible outputs are
    * double, the AUGMENTED frame carrying the hidden sum/count partials
    * after the visible columns (the engine conceals `__mv_` columns on
    * reads; [[mergePartials]] consumes them on incremental refresh).
    */
  private def mvMaterialization(select: String): DataFrame = {
    val srcSet = referencedSources(select).keys.flatMap { k =>
      k.split('.') match {
        case Array(s, t) => Some((s, t))
        case _ => None
      }
    }.toSet
    val avgOut = MvIncremental.classify(spark, select, srcSet, sessionSchema) match {
      case Some(MvIncremental.MvAggShape(o)) if o.contains(MvIncremental.MvAvg) =>
        Some(o)
      case _ => None
    }
    avgOut.flatMap { o =>
      val subs = srcSet.map { case (s, t) =>
        (s, t) -> catalog.readLatest(s, t) }.toMap
      MvIncremental.replayAugmented(spark, select, subs, sessionSchema, o)
        .filter { df =>
          val fs = df.schema.fields
          o.zipWithIndex.forall {
            case (MvIncremental.MvAvg, i) =>
              fs(i).dataType == org.apache.spark.sql.types.DoubleType
            case _ => true
          }
        }
    }.getOrElse(query(SqlStatement(select)))
  }

  /** Merge the materialized rows with the delta's partial aggregate:
    * re-group by the key columns, count merges by SUM, sum/min/max by
    * themselves; each measure casts back to the view's declared column
    * type (re-summing widens decimals). An all-keys aggregate (GROUP BY
    * with no measures) merges as DISTINCT. avg measures merge through
    * their hidden sum/count partials (`__mv_s_i`/`__mv_c_i`, stored
    * after the visible columns): both partials re-SUM, then the visible
    * value re-divides — guarded against a zero merged count (an all-NULL
    * group), where avg is NULL.
    */
  private def mergePartials(current: DataFrame, partial: DataFrame,
                            outputs: Seq[MvIncremental.MvOut]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, max, min, sum, when}
    val fields = current.schema.fields
    val nAvg = outputs.count(_ == MvIncremental.MvAvg)
    require(fields.length == outputs.length + 2 * nAvg,
      s"MV has ${fields.length} columns but the definition classified " +
        s"${outputs.length} (+ ${2 * nAvg} hidden avg partials)")
    val u = current.union(partial.toDF(fields.map(_.name).toSeq: _*))
    val visible = fields.take(outputs.length)
    val keys = visible.zip(outputs).collect {
      case (f, MvIncremental.MvKey) => col(f.name) }.toSeq
    val aggs = visible.zip(outputs).collect {
      case (f, MvIncremental.MvMerge(fn)) =>
        val m = fn match {
          case "count" | "sum" => sum(col(f.name))
          case "min" => min(col(f.name))
          case "max" => max(col(f.name))
        }
        m.cast(f.dataType).as(f.name)
    }.toSeq ++ outputs.zipWithIndex.collect {
      case (MvIncremental.MvAvg, i) => Seq(
        sum(col(s"__mv_s_$i")).as(s"__mv_s_$i"),
        sum(col(s"__mv_c_$i")).cast("long").as(s"__mv_c_$i"))
    }.flatten
    val grouped =
      if (aggs.isEmpty) u.distinct()
      else u.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val selects = fields.zipWithIndex.map { case (f, idx) =>
      if (idx < outputs.length && outputs(idx) == MvIncremental.MvAvg)
        when(col(s"__mv_c_$idx") === 0L, lit(null))
          .otherwise(col(s"__mv_s_$idx") / col(s"__mv_c_$idx"))
          .cast(f.dataType).as(f.name)
      else col(f.name)
    }.toSeq
    grouped.select(selects: _*)
  }

  private[graft] def rewriteCatalogRefs(sql: String): String = {
    val spans = literalSpans(sql)
    catalogRefRe.replaceAllIn(sql, m => {
      val (sch, tbl) = (m.group(2), m.group(3))
      val keyword = m.matched.substring(0, m.matched.length - m.group(1).length)
      if (overlapsLiteral(spans, m.start, m.end))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else resolveCatalogName(sql, sch, tbl) match {
        case Some(view) => java.util.regex.Matcher.quoteReplacement(keyword + view)
        case None => java.util.regex.Matcher.quoteReplacement(m.matched)
      }
    })
  }

  /** `FROM/JOIN <bare-name>` under the session schema (Trino resolves
    * unqualified names against ClientSessionProperties.Schema — reference
    * AthenaClient.cs:37-45). Runs AFTER [[rewriteCatalogRefs]] consumed
    * the qualified spellings. A bare name the catalog doesn't own in the
    * session schema (Spark temp views, VALUES, table functions `f(…)`,
    * metadata refs `t$kind`) passes through untouched.
    */
  private val bareRefRe =
    """(?i)\b(FROM|JOIN)\s+([A-Za-z_]\w*)\b(?!\s*[.($])""".r

  private[graft] def rewriteBareRefs(sql: String): String = {
    val spans = literalSpans(sql)
    bareRefRe.replaceAllIn(sql, m => {
      val (kw, tbl) = (m.group(1), m.group(2))
      if (overlapsLiteral(spans, m.start, m.end))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else resolveCatalogName(sql, sessionSchema, tbl) match {
        case Some(view) => java.util.regex.Matcher.quoteReplacement(s"$kw $view")
        case None => java.util.regex.Matcher.quoteReplacement(m.matched)
      }
    })
  }

  /** Collision-proof suffix for generated view names: `_` joining alone is
    * ambiguous — (a, b_c) and (a_b, c) both flatten to a_b_c, so two
    * distinct catalog tables would silently share one temp view (and
    * return each other's rows). The hash is over the NUL-separated pair,
    * which no identifier can contain.
    */
  /** Drop `__mv_` columns — an avg-MV's hidden sum/count partials are
    * internal refresh state, never part of the user-visible result set
    * (applies to latest reads AND time travel; the `"t$…"` metadata
    * tables stay raw by design).
    */
  private def concealMv(df0: DataFrame): DataFrame = {
    val hidden = df0.columns.filter(_.startsWith("__mv_"))
    if (hidden.isEmpty) df0 else df0.drop(hidden.toIndexedSeq: _*)
  }

  private def nameTag(sch: String, tbl: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$sch\u0000$tbl".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
  }

  // ---- time travel in SQL (T1) ----

  // the travel operand: a dotted name, or Trino's quoted branch form
  // `[sch.]"t@branch"` — branch-scoped time travel ("what did the branch
  // look like before the fix"), resolved against the BRANCH's history
  private val travelOperand =
    """((?:[A-Za-z_]\w*\.){0,2}[A-Za-z_]\w*|(?:(?:[A-Za-z_]\w*\.)?[A-Za-z_]\w*\.)?"[A-Za-z_]\w*@[A-Za-z_]\w*")"""

  private val timeTravelRe =
    ("""(?is)(?<![\w."])""" + travelOperand +
      """\s+FOR\s+TIMESTAMP\s+AS\s+OF\s+TIMESTAMP\s+'([^']+)'""").r

  private val versionTravelRe =
    ("""(?is)(?<![\w."])""" + travelOperand +
      """\s+FOR\s+VERSION\s+AS\s+OF\s+(\d+|'[A-Za-z][A-Za-z0-9_]*')""").r

  private val branchOperandRe =
    """(?s)^(?:(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\.)?"([A-Za-z_]\w*)@([A-Za-z_]\w*)"$""".r

  /** Rewrite `FROM [catalog.]<schema>.<table> FOR TIMESTAMP AS OF
    * TIMESTAMP '<ts>'` (the reference's only time-travel form,
    * AthenaClientTests.cs:374; a catalog qualifier is accepted and
    * dropped) and Trino's second Iceberg form `FOR VERSION AS OF
    * <snapshot_id>` into views over the resolved snapshot. The rest of
    * the statement (WHERE / ORDER BY composition) flows through Catalyst
    * untouched.
    */
  private[graft] def rewriteTimeTravel(sql: String): String = {
    val spans = literalSpans(sql)
    val tsDone = timeTravelRe.replaceAllIn(sql, m => {
      // a legit match CONTAINS a literal (the timestamp), so only the
      // match start position decides whether we're inside a string
      if (overlapsLiteral(spans, m.start, m.start + 1))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else rewriteTimeTravelMatch(sql, m)
    })
    val spans2 = literalSpans(tsDone)
    versionTravelRe.replaceAllIn(tsDone, m => {
      // a quoted-ref match CONTAINS a literal (the ref name), so only the
      // match start decides whether we're inside a string
      if (overlapsLiteral(spans2, m.start, m.start + 1))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else {
        val (sch, tbl, brOpt) = travelTarget(m.group(1))
        brOpt.foreach(b => requireBranch(sql, sch, tbl, b))
        val arg = m.group(2)
        val (df, tag) =
          if (arg.startsWith("'")) {
            // Trino Iceberg's branch/tag read: FOR VERSION AS OF '<ref>'
            val ref = arg.stripPrefix("'").stripSuffix("'")
            if (brOpt.isDefined)
              throw new GraftQueryException(sql,
                s"Cannot combine a branch operand with FOR VERSION AS OF '$ref'")
            (try catalog.readRef(sch, tbl, ref)
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sql, e.getMessage, e) }, ref)
          } else {
            val id = arg.toLong
            val cat = brOpt.map(catalog.branch).getOrElse(catalog)
            (try cat.readVersion(sch, tbl, id)
            catch { case e: IllegalArgumentException =>
              throw new GraftQueryException(sql, e.getMessage, e) },
              brOpt.map(_ + "_").getOrElse("") + id.toString)
          }
        val view = s"_tv_${sch}_${tbl}_${nameTag(sch, tbl)}_$tag"
        concealMv(df).createOrReplaceTempView(view)
        java.util.regex.Matcher.quoteReplacement(view)
      }
    })
  }

  /** (schema, table, branch?) of a travel operand — dotted name or the
    * quoted `[sch.]"t@branch"` form.
    */
  private def travelTarget(op: String): (String, String, Option[String]) =
    op match {
      case branchOperandRe(sch0, tbl, br) =>
        (Option(sch0).getOrElse(sessionSchema), tbl, Some(br))
      case _ =>
        val parts = op.split("\\.")
        if (parts.length >= 2) (parts(parts.length - 2), parts.last, None)
        else (sessionSchema, parts(0), None)
    }

  private def requireBranch(sql: String, sch: String, tbl: String, b: String): Unit =
    if (!catalog.branchExists(sch, tbl, b))
      throw new GraftQueryException(sql, s"Branch $b does not exist on $sch.$tbl")

  private def rewriteTimeTravelMatch(sql: String,
                                     m: scala.util.matching.Regex.Match): String = {
      val (sch, tbl, brOpt) = travelTarget(m.group(1))
      brOpt.foreach(b => requireBranch(sql, sch, tbl, b))
      val ts = java.time.LocalDateTime.parse(m.group(2).trim.replace(" ", "T"))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      val view = s"_tt_${sch}_${tbl}_${brOpt.map(_ + "_").getOrElse("")}" +
        s"${nameTag(sch, tbl)}_$ts"
      // a branch operand resolves the timestamp against the BRANCH's own
      // history — the audit read "what did the branch hold at t"
      concealMv(brOpt.map(catalog.branch).getOrElse(catalog)
        .readAsOf(sch, tbl, ts)).createOrReplaceTempView(view)
      java.util.regex.Matcher.quoteReplacement(view)
  }
}
