package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.nio.charset.StandardCharsets
import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 sink (`format("graft_jsonl")`): JSON-lines files with a
  * real two-phase commit — the write-side twin of the graft_docs source,
  * completing the connector surface (r2/r3 shipped read-only: splits,
  * pruning, pushdown).
  *
  * Protocol, the part that matters at 1000 executors: each task writes a
  * `.staged-<epoch>-<partition>-<task>` file and reports it in its
  * commit message; ONLY the driver's `commit()` renames staged files to
  * visible `part-*.jsonl` names, and `abort()` deletes whatever staged
  * files the failed job left. A reader can never observe a torn write:
  * speculative / retried / zombie tasks each stage under a unique task
  * id and at most one staged file per partition is promoted. Rename
  * results are checked (object stores can fail a rename without
  * throwing — same rule as StreamingOps' swap).
  *
  * Modes: append adds part files; overwrite (SupportsTruncate) promotes
  * the new files first and deletes the replaced ones last, so a failed
  * commit can leave extra data visible but never lose the old data
  * while the new is still hidden. Non-finite doubles serialize as JSON
  * null (JSON has no NaN/Infinity; pandas to_json convention).
  */
class JsonLinesSinkProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft_jsonl"

  // a pure sink has no schema to infer; reads go through spark.read.json
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JsonLinesTable(schema, properties.asScala.toMap)
}

private[sources] class JsonLinesTable(schema0: StructType,
    props: Map[String, String]) extends Table with SupportsWrite {
  override def name(): String = s"graft_jsonl(${props.getOrElse("path", "?")})"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = info.options.get("path")
    require(path != null && path.nonEmpty,
      "graft_jsonl requires a 'path' option")
    new JsonLinesWriteBuilder(path, info.schema(), info.queryId())
  }
}

private[sources] class JsonLinesWriteBuilder(path: String,
    schema: StructType, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    private val t = doTruncate
    override def toBatch: BatchWrite =
      new JsonLinesBatchWrite(path, schema, queryId, t)
  }
}

private[sources] case class StagedFile(name: String)
    extends WriterCommitMessage

private[sources] class JsonLinesBatchWrite(path: String,
    schema: StructType, queryId: String, truncate: Boolean)
    extends BatchWrite {

  // unsupported column types must fail at planning, not per-row on
  // executors mid-job
  schema.fields.foreach { f =>
    JsonLinesWriter.checkType(f.name, f.dataType)
  }

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // ship the driver's Hadoop configuration to executors (fs.defaultFS,
    // spark.hadoop.* credentials, endpoints) — a bare new Configuration()
    // on the executor only works for filesystems needing zero config
    import scala.jdk.CollectionConverters._
    val hconf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    new JsonLinesWriterFactory(path, schema, queryId,
      hconf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray)
  }

  // driver side: the active session's hadoop conf; the path URI scheme
  // picks the filesystem
  private def fs() = new Path(path).getFileSystem(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs()
    val dir = new Path(path)
    def must(ok: Boolean, step: String): Unit =
      if (!ok) throw new java.io.IOException(s"graft_jsonl commit: $step failed")
    // promote the NEW data first (fresh queryId names cannot collide
    // with old part files), delete the replaced files LAST: a rename
    // failure mid-commit then leaves the old data intact instead of
    // lost-with-the-new-data-still-hidden
    val old: Array[Path] =
      if (truncate && f.exists(dir))
        f.listStatus(dir).map(_.getPath)
          .filter(_.getName.startsWith("part-"))
      else Array.empty
    val promoted = messages.map {
      case StagedFile(name) =>
        val staged = new Path(dir, name)
        val visible = new Path(dir,
          name.replaceFirst("^\\.staged-", "part-") + ".jsonl")
        must(f.rename(staged, visible), s"rename $staged -> $visible")
        visible.getName
      case other =>
        throw new IllegalStateException(s"unexpected commit message $other")
    }.toSet
    old.filterNot(p => promoted(p.getName))
      .foreach(p => must(f.delete(p, false), s"delete $p"))
    // sweep orphan staged files from crashed/zombie attempts of THIS
    // query (a killed executor never runs DataWriter.abort; only the
    // winning attempt's file is in a commit message) — without this,
    // successful jobs leak .staged-* clutter forever. BEST-EFFORT only:
    // a zombie task may still hold its staged file open and some
    // filesystems recreate it on the writer's close/flush, so one file
    // can leak until the next commit; correctness is untouched either
    // way (only promoted part-*.jsonl files are ever visible). By this
    // point every promotion already succeeded, so NOTHING here may fail
    // the commit — a false delete return is logged, and a thrown
    // IOException (lease held by a zombie, transient store RPC) is
    // caught and logged too; either would otherwise report a failed
    // write whose output is fully visible.
    try f.listStatus(dir)
      .filter(_.getPath.getName.startsWith(s".staged-$queryId"))
      .foreach { st =>
        if (!f.delete(st.getPath, false))
          Console.err.println(
            s"graft_jsonl: orphan staged file survived sweep: ${st.getPath}")
      }
    catch {
      // NonFatal, not just IOException: an object-store SDK can surface
      // untranslated RuntimeExceptions from listStatus/delete, and the
      // invariant is that NOTHING in this best-effort sweep fails a
      // commit whose data is already visible
      case scala.util.control.NonFatal(e) =>
        Console.err.println(
          s"graft_jsonl: orphan sweep failed (data already committed): $e")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs()
    val dir = new Path(path)
    // messages may hold nulls for tasks that never committed; staged
    // files from those tasks were already cleaned by DataWriter.abort —
    // sweep any stragglers for this query id anyway
    if (f.exists(dir)) {
      f.listStatus(dir)
        .filter(_.getPath.getName.startsWith(s".staged-$queryId"))
        .foreach(st => f.delete(st.getPath, false))
    }
  }
}

private[sources] class JsonLinesWriterFactory(path: String,
    schema: StructType, queryId: String,
    hadoopProps: Array[(String, String)]) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new JsonLinesWriter(path, schema, queryId, partitionId, taskId,
      hadoopProps)
}

private[sources] object JsonLinesWriter {
  def checkType(name: String, dt: DataType): Unit = dt match {
    case LongType | IntegerType | DoubleType | BooleanType | StringType
        | DateType | TimestampType =>
    case other => throw new UnsupportedOperationException(
      s"graft_jsonl cannot write column '$name' of type ${other.sql}")
  }

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }
}

private[sources] class JsonLinesWriter(path: String, schema: StructType,
    queryId: String, partitionId: Int, taskId: Long,
    hadoopProps: Array[(String, String)])
    extends DataWriter[InternalRow] {

  private val name = s".staged-$queryId-$partitionId-$taskId"
  private val staged = new Path(new Path(path), name)
  // rebuild the driver's Hadoop conf, and take an UNCACHED FileSystem:
  // setWriteChecksum on the shared cached instance would silently turn
  // checksums off for every other user of that filesystem in this JVM
  private val fs: FileSystem = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    hadoopProps.foreach { case (k, v) => conf.set(k, v) }
    val f = FileSystem.newInstance(staged.toUri, conf)
    // no .crc sidecars next to the data files — the sink's contract is
    // "only part-*.jsonl appear"
    f.setWriteChecksum(false)
    f
  }
  private val out = fs.create(staged, true)

  // the `"name":` prefixes are schema constants — escaped once here, not
  // re-walked per row per column on the write hot path
  private val fieldPrefix: Array[String] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      (if (i == 0) "\"" else ",\"") + JsonLinesWriter.escape(f.name) + "\":"
    }.toArray

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder("{")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      sb.append(fieldPrefix(i))
      if (row.isNullAt(i)) sb.append("null")
      else f.dataType match {
        case LongType => sb.append(row.getLong(i))
        case IntegerType => sb.append(row.getInt(i))
        case DoubleType =>
          val d = row.getDouble(i)
          // JSON has no NaN/Infinity tokens; map non-finite to null
          // (pandas to_json convention) rather than emit invalid JSON
          if (java.lang.Double.isFinite(d)) sb.append(d)
          else sb.append("null")
        case BooleanType => sb.append(row.getBoolean(i))
        case StringType => sb.append('"')
          .append(JsonLinesWriter.escape(row.getUTF8String(i).toString))
          .append('"')
        case DateType => sb.append('"').append(
          java.time.LocalDate.ofEpochDay(row.getInt(i))).append('"')
        case TimestampType => sb.append('"').append(
          java.time.Instant.EPOCH.plus(row.getLong(i),
            java.time.temporal.ChronoUnit.MICROS)).append('"')
        case other => throw new UnsupportedOperationException(other.sql)
      }
    }
    sb.append("}\n")
    out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFile(name)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => }
    fs.delete(staged, false)
  }

  // the FS is a private newInstance — close it or leak one per task
  override def close(): Unit =
    try fs.close() catch { case _: Throwable => }
}
