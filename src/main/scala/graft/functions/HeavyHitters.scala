package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate`
  * (SURVEY.md §7.3 stretch: sketches beyond approx_count_distinct, and a
  * deeper Catalyst form than the Aggregator-based KMV: the buffer is a
  * live JVM hash map that serializes ONLY at shuffle boundaries, not
  * through an encoder per row).
  *
  * Guarantees (Misra-Gries 1982; Agarwal et al. merge): with k counters,
  * every item with true frequency > n/(k+1) is present, each reported
  * count undercounts by at most n/(k+1), and the sketch is EXACT whenever
  * the group's distinct count ≤ k (no decrement ever fires) — which makes
  * low-cardinality heavy-hitter queries oracle-checkable against a plain
  * GROUP BY. Merge is the standard combine-then-subtract-(k+1)th rule,
  * associative and shuffle-order-safe for the exact regime.
  *
  * Output: array<struct<item string, cnt bigint>> sorted (cnt desc, item
  * asc) — deterministic for downstream explode.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters expects (string, k > 0), got " +
        s"${child.dataType.simpleString}, k=$k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // MG decrement step: every counter loses one; zeros evicted
          buf.filterInPlace((_, c) => c > 1L)
            .mapValuesInPlace((_, c) => c - 1L)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) =>
      buf.update(s, buf.getOrElse(s, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - 1 - k)
      buf.filterInPlace((_, c) => c > m)
        .mapValuesInPlace((_, c) => c - m)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c): Any
    })
  }

  // length-prefixed raw UTF-8, not writeUTF: writeUTF caps entries at
  // 64 KiB and would crash the shuffle-boundary serialization on long
  // tracked strings (document bodies, log lines)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
