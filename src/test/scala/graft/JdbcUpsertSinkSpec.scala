package graft

import graft.sinks.JdbcUpsertSink
import graft.sinks.JdbcUpsertSink.{FileConnector, MergeSpec}
import org.scalatest.funsuite.AnyFunSuite

/** S7 gate: the generated staging/COPY/merge SQL must match the shape of
  * the reference's production load path (ETL_OMS_OPERATIONNEL.py:180-211),
  * and the load orchestration must run DDL → stage → merge in order.
  */
class JdbcUpsertSinkSpec extends AnyFunSuite with SparkSuite {

  private val spec = JdbcUpsertSink.statistiqueSpec

  test("staging DDL matches the reference temp-table shape") {
    val ddl = JdbcUpsertSink.createStagingSql(spec)
    assert(ddl.startsWith("DROP TABLE IF EXISTS temp_statistique;"))
    assert(ddl.contains("CREATE TEMP TABLE temp_statistique"))
    assert(ddl.contains("id_region INTEGER"))
    assert(ddl.contains("date DATE"))
    // the distributed load path must NOT use a session-scoped TEMP table:
    // executor jdbc writers and the merge run on separate connections
    val perm = JdbcUpsertSink.createStagingSql(spec, temp = false)
    assert(perm.contains("CREATE TABLE temp_statistique"))
    assert(!perm.contains("TEMP TABLE"))
  }

  test("COPY statement matches the reference copy_expert shape") {
    assert(JdbcUpsertSink.copySql(spec) ===
      "COPY temp_statistique(id_maladie, id_region, date, nouveau_mort, " +
        "nouveau_cas, total_mort, total_cas) FROM STDIN WITH CSV")
  }

  test("merge statement matches the reference ON CONFLICT upsert") {
    val sql = JdbcUpsertSink.insertOnConflictSql(spec)
    assert(sql.contains("INSERT INTO statistique (id_maladie, id_region, " +
      "date, nouveau_mort, nouveau_cas, total_mort, total_cas)"))
    assert(sql.contains("FROM temp_statistique"))
    assert(sql.contains("ON CONFLICT (id_region, date) DO UPDATE SET"))
    assert(sql.contains("nouveau_mort = EXCLUDED.nouveau_mort"))
    assert(sql.contains("total_cas = EXCLUDED.total_cas"))
    // conflict keys are matched, not clobbered
    assert(!sql.contains("id_region = EXCLUDED"))
  }

  test("load runs DDL, stages the frame, then merges — in that order") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jdbc").toString
    val conn = new FileConnector(dir)
    val df = Seq((1, 7, "2024-01-01", 2, 5, 10, 20))
      .toDF("id_maladie", "id_region", "date", "nouveau_mort",
        "nouveau_cas", "total_mort", "total_cas")
    JdbcUpsertSink.load(df, spec, conn)
    assert(conn.executed.size === 3)
    // permanent staging with a per-run unique name (concurrent loads must
    // not clobber each other), merged, then dropped
    assert(conn.executed.head.contains("CREATE TABLE temp_statistique_"))
    assert(!conn.executed.head.contains("TEMP TABLE"))
    assert(conn.executed(1).contains("ON CONFLICT"))
    assert(conn.executed(1).contains("FROM temp_statistique_"))
    assert(conn.executed.last.startsWith(
      "DROP TABLE IF EXISTS temp_statistique_"))
    // the staged CSV exists (under the run-unique name) and carries the
    // spec's column order
    val stagedDir = new java.io.File(dir).listFiles()
      .find(_.getName.startsWith("temp_statistique_")).get
    val staged = spark.read.option("header", true).csv(stagedDir.getPath)
    assert(staged.columns.toSeq === spec.columns)
    assert(staged.count() === 1)
  }

  test("spec validation rejects unknown conflict/update columns") {
    val ty = Map("a" -> "INTEGER")
    intercept[IllegalArgumentException] {
      MergeSpec("t", "tmp", Seq("a"), ty, Seq("b"), Seq("a"))
    }
    intercept[IllegalArgumentException] {
      MergeSpec("t", "tmp", Seq("a"), ty, Seq("a"), Seq("b"))
    }
  }

  test("spec validation rejects columns without a staging type") {
    // a silent TEXT fallback would stage a column Spark's typed INSERT
    // can't bind — must fail at construction
    val e = intercept[IllegalArgumentException] {
      MergeSpec("t", "tmp", Seq("a", "b"), Map("a" -> "INTEGER"),
        Seq("a"), Seq("b"))
    }
    assert(e.getMessage.contains("b"))
  }

  test("ANSI merge references the target in case-folded (uppercase) form") {
    // the target is a pre-existing unquoted-DDL table → Derby/Oracle/DB2
    // hold its columns uppercase; the staging table is ours → quoted
    // case-exact lowercase (Spark's jdbc writer quotes its INSERT columns)
    val sql = JdbcUpsertSink.AnsiMergeDialect.merge(spec)
    assert(sql.contains("""t."ID_REGION" = s."id_region""""), sql)
    assert(sql.contains(""""NOUVEAU_MORT" = s."nouveau_mort""""), sql)
    assert(sql.contains(""""DATE""""), sql) // reserved word, quoted folded
    assert(!sql.contains("""t."id_region""""), sql)
  }
}
