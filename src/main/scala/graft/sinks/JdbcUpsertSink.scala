package graft.sinks

import org.apache.spark.sql.DataFrame

/** S7: the reference's production load path — staging-table bulk load
  * followed by a single `INSERT … SELECT … ON CONFLICT DO UPDATE` merge
  * (reference ETL_OMS_OPERATIONNEL.py:170-216: `temp_statistique` COPY,
  * then the ON CONFLICT (id_region, date) upsert into `statistique`) —
  * re-expressed as a Spark-native sink facade.
  *
  * Spark mapping: the staging load is `df.write.jdbc` (partition-parallel
  * inserts — Spark's equivalent of the reference's single-connection
  * `COPY`, and the part that must scale with the data), the merge is ONE
  * driver-side statement on one connection (it moves no data through the
  * driver; the database does the set-based merge). The SQL generation is
  * pure and unit-tested; the connector is injectable so the harness (no
  * database) tests against a file-backed fake while production supplies
  * [[JdbcConnector]] with a real URL.
  */
object JdbcUpsertSink {

  /** Merge contract: load `columns` of a frame into `table` via
    * `stagingTable`, upserting on `conflictKeys` with last-write-wins on
    * `updateColumns`.
    */
  final case class MergeSpec(
      table: String,
      stagingTable: String,
      columns: Seq[String],
      columnTypes: Map[String, String],
      conflictKeys: Seq[String],
      updateColumns: Seq[String]) {
    require(conflictKeys.forall(columns.contains),
      "conflict keys must be loaded columns")
    require(updateColumns.forall(columns.contains),
      "update columns must be loaded columns")
    // a silent TEXT/VARCHAR fallback for an untyped column would create a
    // staging column Spark's typed jdbc INSERT then can't bind (e.g. int
    // into text errors on Postgres and Derby alike) — fail at
    // construction, not mid-load on an executor
    require(columns.forall(columnTypes.contains),
      s"missing staging types for ${columns.filterNot(columnTypes.contains)
        .mkString(", ")}")
  }

  /** Staging DDL (reference's CREATE TEMP TABLE temp_statistique,
    * ETL_OMS_OPERATIONNEL.py:180-190). `temp = true` reproduces the
    * reference's single-connection TEMP table; the distributed [[load]]
    * path MUST use `temp = false` — a TEMP table is session-scoped, and
    * both Spark's executor-side jdbc writers and any later driver
    * statement connect on their own sessions, so a TEMP staging table
    * would have vanished before the data or the merge arrive.
    */
  def createStagingSql(spec: MergeSpec, temp: Boolean = true): String = {
    val cols = spec.columns
      .map(c => s"$c ${spec.columnTypes(c)}")
      .mkString(", ")
    val kind = if (temp) "TEMP TABLE" else "TABLE"
    s"DROP TABLE IF EXISTS ${spec.stagingTable}; " +
      s"CREATE $kind ${spec.stagingTable} ($cols);"
  }

  /** Post-merge staging cleanup for the permanent-staging [[load]] path. */
  def dropStagingSql(spec: MergeSpec): String =
    s"DROP TABLE IF EXISTS ${spec.stagingTable};"

  /** Postgres bulk-copy form (reference's copy_expert,
    * ETL_OMS_OPERATIONNEL.py:194-197). Spark's `write.jdbc` replaces this
    * in the distributed path; the statement is still generated for
    * single-connection loaders.
    */
  def copySql(spec: MergeSpec): String =
    s"COPY ${spec.stagingTable}(${spec.columns.mkString(", ")}) " +
      "FROM STDIN WITH CSV"

  /** The merge statement (reference ETL_OMS_OPERATIONNEL.py:202-211). */
  def insertOnConflictSql(spec: MergeSpec): String = {
    val cols = spec.columns.mkString(", ")
    val sets = spec.updateColumns
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO ${spec.table} ($cols) " +
      s"SELECT $cols FROM ${spec.stagingTable} " +
      s"ON CONFLICT (${spec.conflictKeys.mkString(", ")}) " +
      s"DO UPDATE SET $sets;"
  }

  /** Statement dialect for [[load]]. [[PostgresDialect]] emits the
    * reference's exact statement shapes (compound DROP IF EXISTS + CREATE,
    * `ON CONFLICT DO UPDATE`); [[AnsiMergeDialect]] targets engines
    * without ON CONFLICT (Derby, Oracle, DB2) via the standard SQL:2003
    * `MERGE` — exercised end-to-end against embedded Derby in
    * JdbcDerbyIntegrationSpec.
    */
  trait Dialect {
    def createStaging(spec: MergeSpec): Seq[String]
    def merge(spec: MergeSpec): String
    def dropStaging(spec: MergeSpec): Seq[String]
  }

  object PostgresDialect extends Dialect {
    override def createStaging(spec: MergeSpec): Seq[String] =
      Seq(createStagingSql(spec, temp = false))
    override def merge(spec: MergeSpec): String = insertOnConflictSql(spec)
    override def dropStaging(spec: MergeSpec): Seq[String] =
      Seq(dropStagingSql(spec))
  }

  /** Identifier quoting differs BY SIDE, because the two tables have
    * different provenance:
    *   - STAGING columns are quoted in their given (lowercase) case —
    *     this dialect creates that table itself, and Spark's jdbc writer
    *     quotes every column name in its INSERTs, so the DDL must create
    *     case-exact columns or the executor inserts would miss them.
    *   - TARGET columns are quoted in UPPERCASE — the target is a
    *     PRE-EXISTING table the user created with ordinary unquoted DDL,
    *     which Derby/Oracle/DB2 case-fold to uppercase. Quoting the
    *     folded form references exactly those columns while still
    *     surviving reserved-word names (the reference schema's `date`
    *     cannot even be written unquoted in Derby DDL or MERGE).
    *   Table names stay unquoted — Spark passes the user's table string
    *   through raw, so both sides case-fold identically.
    *
    * MIGRATION (changed in round 7): earlier revisions quoted TARGET
    * columns in their given lowercase and defaulted missing columnTypes
    * entries to a TEXT/VARCHAR fallback. A deployment whose target table
    * was created with quoted-LOWERCASE DDL (the pattern the old doc and
    * the old Derby test prescribed) must recreate/re-case that table —
    * the uppercase-folded references no longer match quoted-lowercase
    * columns — and every caller must now supply a COMPLETE columnTypes
    * map (construction throws otherwise; no silent type fallback).
    */
  object AnsiMergeDialect extends Dialect {
    private def q(id: String) = "\"" + id + "\""
    private def qt(id: String) =
      "\"" + id.toUpperCase(java.util.Locale.ROOT) + "\""
    override def createStaging(spec: MergeSpec): Seq[String] = Seq(
      s"CREATE TABLE ${spec.stagingTable} (" + spec.columns
        .map(c => s"${q(c)} ${spec.columnTypes(c)}")
        .mkString(", ") + ")")
    override def merge(spec: MergeSpec): String = {
      val on = spec.conflictKeys
        .map(k => s"t.${qt(k)} = s.${q(k)}").mkString(" AND ")
      val sets = spec.updateColumns
        .map(c => s"${qt(c)} = s.${q(c)}").mkString(", ")
      val cols = spec.columns.map(qt).mkString(", ")
      val vals = spec.columns.map(c => s"s.${q(c)}").mkString(", ")
      s"MERGE INTO ${spec.table} t USING ${spec.stagingTable} s ON $on " +
        s"WHEN MATCHED THEN UPDATE SET $sets " +
        s"WHEN NOT MATCHED THEN INSERT ($cols) VALUES ($vals)"
    }
    override def dropStaging(spec: MergeSpec): Seq[String] =
      Seq(s"DROP TABLE ${spec.stagingTable}")
  }

  /** Where the statements run. `stage` bulk-loads the frame into the
    * staging table; `execute` runs one driver-side statement.
    */
  trait Connector {
    def execute(sql: String): Unit
    def stage(df: DataFrame, spec: MergeSpec): Unit
  }

  /** Production connector: partition-parallel `df.write.jdbc` staging +
    * driver-side merge on a plain JDBC connection. Untestable in this
    * harness (no database); exercised through the same `load` path as the
    * file-backed fake.
    */
  final class JdbcConnector(url: String,
      props: java.util.Properties) extends Connector {
    override def execute(sql: String): Unit = {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try { conn.createStatement().execute(sql); () }
      finally conn.close()
    }
    override def stage(df: DataFrame, spec: MergeSpec): Unit =
      df.selectExpr(spec.columns: _*)
        .write.mode("append").jdbc(url, spec.stagingTable, props)
  }

  /** Harness fake: staging becomes a CSV directory, every statement is
    * recorded for assertion. Keeps the `load` orchestration (stage →
    * merge order, SQL shape) fully testable without a database.
    */
  final class FileConnector(dir: String) extends Connector {
    val executed: scala.collection.mutable.ArrayBuffer[String] =
      scala.collection.mutable.ArrayBuffer.empty
    override def execute(sql: String): Unit = { executed += sql; () }
    override def stage(df: DataFrame, spec: MergeSpec): Unit =
      df.selectExpr(spec.columns: _*)
        .write.mode("overwrite").option("header", true)
        .csv(s"$dir/${spec.stagingTable}")
  }

  /** The full reference load sequence: staging DDL → bulk stage → merge →
    * drop staging. The staging table is PERMANENT (not TEMP): every
    * `execute` and every executor-side jdbc write runs on its own
    * connection/session, so a session-scoped table would be gone between
    * steps; instead a typed table is created up front (fixing the column
    * types Spark's append-mode jdbc write would otherwise infer). The
    * name gets a per-run unique suffix — concurrent loads must not
    * clobber each other's staged rows — and the drop runs in `finally`
    * so a failed merge does not leak the table.
    */
  def load(df: DataFrame, spec: MergeSpec, connector: Connector,
      dialect: Dialect = PostgresDialect): Unit = {
    val suffix = java.util.UUID.randomUUID().toString
      .replace("-", "").take(12)
    val run = spec.copy(stagingTable = s"${spec.stagingTable}_$suffix")
    var primary: Throwable = null
    try {
      dialect.createStaging(run).foreach(connector.execute)
      connector.stage(df, run)
      connector.execute(dialect.merge(run))
    } catch { case t: Throwable => primary = t; throw t }
    finally {
      // the drop must not MASK a failure from the body (the staging
      // table may not even exist when creation itself failed) — but a
      // drop failure after a successful load is a real leak (the
      // uniquely-named staging table accumulates) and must surface
      try dialect.dropStaging(run).foreach(connector.execute)
      catch {
        case e: Exception =>
          if (primary == null) throw e else primary.addSuppressed(e)
      }
    }
  }

  /** The reference's own statistique contract
    * (ETL_OMS_OPERATIONNEL.py:156-211), ready to pass to [[load]].
    */
  val statistiqueSpec: MergeSpec = MergeSpec(
    table = "statistique",
    stagingTable = "temp_statistique",
    columns = Seq("id_maladie", "id_region", "date", "nouveau_mort",
      "nouveau_cas", "total_mort", "total_cas"),
    columnTypes = Map(
      "id_maladie" -> "INTEGER", "id_region" -> "INTEGER",
      "date" -> "DATE", "nouveau_mort" -> "INTEGER",
      "nouveau_cas" -> "INTEGER", "total_mort" -> "INTEGER",
      "total_cas" -> "INTEGER"),
    conflictKeys = Seq("id_region", "date"),
    updateColumns = Seq("nouveau_mort", "nouveau_cas", "total_mort",
      "total_cas"))
}
