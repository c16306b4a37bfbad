package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 synthetic-corpus source (`format("graft_docs")`):
  * deterministic generated documents with the harness `documents` schema,
  * exercising the full connector surface a production source needs —
  * partition planning (`numPartitions` contiguous id ranges, so the scan
  * is executor-parallel with no driver materialization), column pruning
  * (`SupportsPushDownRequiredColumns` — a `select(n_chars)` never builds
  * the text), and `doc_id` range filter pushdown
  * (`SupportsPushDownFilters` — pruned ranges never generate rows at
  * all). At 100 TB this is the shape of any external-system connector:
  * splits + pruning + pushdown decided at planning time, generation/IO
  * per executor.
  *
  * Options: `rows` (default 1000), `numPartitions` (default 4).
  */
class SyntheticDocsProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft_docs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(properties.asScala.toMap)
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val words = Array("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango")
  private val langs = Array("en", "fr", "es", "de")

  /** splitmix64 — stable across JVMs, cheap, well-mixed. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def word(docId: Long, i: Int): String =
    words((mix(docId * 131 + i) & 0x7fffffff).toInt % words.length)

  private def nTokens(docId: Long): Int =
    8 + (mix(docId) & 0x1f).toInt // 8..39 tokens

  def text(docId: Long): String = {
    val n = nTokens(docId)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(word(docId, i))
      i += 1
    }
    sb.toString
  }

  /** Length of [[text]] WITHOUT materializing the string — so a
    * projection of n_chars alone really skips text generation.
    */
  def nChars(docId: Long): Long = {
    val n = nTokens(docId)
    var len = n - 1L // separators
    var i = 0
    while (i < n) { len += word(docId, i).length; i += 1 }
    len
  }

  def lang(docId: Long): String =
    langs((mix(docId + 7) & 0x7fffffff).toInt % langs.length)
}

private[sources] class SyntheticDocsTable(props: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = "graft_docs"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val all = props ++ options.asScala
    new SyntheticDocsScanBuilder(
      all.getOrElse("rows", "1000").toLong,
      all.getOrElse("numpartitions", "4").toInt)
  }
}

private[sources] class SyntheticDocsScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = SyntheticDocs.schema
  // id range narrowed by pushed doc_id predicates: [lo, hi)
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve source field order regardless of projection order
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(
      SyntheticDocs.schema.fields.filter(f => keep.contains(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case IsNotNull("doc_id") => true
      case _ => false
    }
    // saturating successor: `Long.MaxValue + 1` would wrap negative and
    // silently invert an absorbed bound (e.g. `> Long.MaxValue` returning
    // every row). Saturation keeps both bounds exact here because ids
    // live in [0, n) with n far below Long.MaxValue.
    def inc(v: Long): Long =
      if (v == Long.MaxValue) Long.MaxValue else v + 1
    accepted.foreach {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, inc(v))
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, inc(v))
      case IsNotNull(_) => // non-nullable: always true
      case _ =>
    }
    pushed = accepted
    rejected // Spark re-evaluates what the source did not fully absorb
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SyntheticDocsScan(required, lo, math.max(lo, hi), parts, pushed)
}

private[sources] class SyntheticDocsScan(required: StructType, lo: Long,
    hi: Long, parts: Int, pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft_docs range=[$lo,$hi) " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    val p = math.max(1, math.min(parts.toLong, n)).toInt
    (0 until p).map { i =>
      SyntheticDocsPartition(
        lo + i * n / p, lo + (i + 1) * n / p): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticDocsReaderFactory(required.fieldNames)
}

case class SyntheticDocsPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class SyntheticDocsReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticDocsPartition]
    // per-scan column extractors, resolved ONCE: only the pruned columns
    // are ever generated (n_chars is computed without building the text),
    // and the per-row path does no name matching or Seq allocation
    val extractors: Array[Long => Any] = fields.map {
      case "doc_id" => (id: Long) => id
      case "text" =>
        (id: Long) => UTF8String.fromString(SyntheticDocs.text(id))
      case "lang" =>
        (id: Long) => UTF8String.fromString(SyntheticDocs.lang(id))
      case "n_chars" => (id: Long) => SyntheticDocs.nChars(id)
    }
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        val values = new Array[Any](extractors.length)
        var i = 0
        while (i < extractors.length) { values(i) = extractors(i)(id); i += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          values)
      }
      override def close(): Unit = ()
    }
  }
}
