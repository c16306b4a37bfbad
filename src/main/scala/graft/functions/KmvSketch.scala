package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values distinct-count sketch as a typed
  * `Aggregator[IN, BUF, OUT]` (SURVEY.md §7.3 stretch: sketches beyond
  * approx_count_distinct).
  *
  * KMV keeps the k smallest 64-bit hashes seen; the distinct-count
  * estimate is (k-1) / kth-min normalized hash. The buffer is a bounded
  * sorted array, merge is a k-way min-union — both associative and
  * commutative, so partial aggregation and any shuffle order give the
  * same result. Hashing is MurmurHash3 over UTF-8 (deterministic across
  * JVMs/executors).
  */
/** Shared KMV math — one definition for both the typed Aggregator and
  * the TypedImperativeAggregate form so the two can't drift.
  */
object KmvMath {
  def hash64(s: String): Long = {
    // two 32-bit murmur passes with different seeds → stable 64-bit
    val lo = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
    val hi = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** splitmix64 finalizer for native integer keys — full-avalanche
    * 64-bit mix with zero allocation, so a long column skips the
    * cast-to-string + per-row String the string path would pay (the
    * sketch update was the whole cost of q_kmv_distinct; ~0.8s/query
    * at sf0.1).
    */
  def hash64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** (k-1) / kth-min normalized hash; exact count below k distinct. */
  def estimate(kth: Long, len: Int, k: Int): Double =
    if (len < k) len.toDouble
    else {
      val norm = (kth.toDouble - Long.MinValue.toDouble) /
        (Long.MaxValue.toDouble - Long.MinValue.toDouble)
      (k - 1) / norm
    }
}

class KmvDistinct(k: Int) extends Aggregator[String, Array[Long], Double] {
  // mirror KmvSketchAgg's checkInputDataTypes gate: k=0 would crash
  // insert's `buf.last` on the first row, k=1 would silently estimate
  // 0.0 for every group ((k-1)/norm) — fail at construction instead
  require(k > 1, s"kmv sketch size k must be > 1, got $k")

  private def hash64(s: String): Long = KmvMath.hash64(s)

  override def zero: Array[Long] = Array.empty

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    if (buf.length >= k && h >= buf.last) buf
    else {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        // single O(k) arraycopy insert at the search's insertion point —
        // no full re-sort per accepted hash
        val ins = -pos - 1
        val outLen = math.min(buf.length + 1, k)
        val out = new Array[Long](outLen)
        System.arraycopy(buf, 0, out, 0, ins)
        if (ins < outLen) {
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1,
            outLen - ins - 1)
        }
        out
      }
    }
  }

  override def reduce(buf: Array[Long], in: String): Array[Long] =
    if (in == null) buf else insert(buf, hash64(in))

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val merged = (a ++ b).distinct.sorted
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: Array[Long]): Double =
    KmvMath.estimate(if (buf.isEmpty) 0L else buf.last, buf.length, k)

  // native array<bigint> encoder: Kryo round-tripped the buffer through
  // generic java serialization per update, which made a trivial 256-long
  // sketch cost ~10x an exact countDistinct
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvDistinct {
  /** Column function: approximate distinct count of a string column. */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    udaf(new KmvDistinct(k), Encoders.STRING).apply(c)
}

/** Mutable k-min buffer: a sorted long array with in-place binary-search
  * insert — the live JVM object a [[KmvSketchAgg]] buffer holds between
  * serialization points.
  */
final class KmvBuffer(val k: Int) {
  val arr = new Array[Long](k)
  var len = 0

  def insert(h: Long): Unit = {
    if (len >= k && h >= arr(k - 1)) return
    val pos = java.util.Arrays.binarySearch(arr, 0, len, h)
    if (pos >= 0) return // already present
    val ins = -pos - 1
    val moveEnd = math.min(len, k - 1)
    System.arraycopy(arr, ins, arr, ins + 1, moveEnd - ins)
    arr(ins) = h
    if (len < k) len += 1
  }
}

/** KMV distinct estimator as a `TypedImperativeAggregate` — the
  * execution-grade form of [[KmvDistinct]]: the buffer is a live JVM
  * sorted array mutated in place per row and serialized ONLY at shuffle
  * boundaries, where the Aggregator/udaf path round-trips its buffer
  * through an encoder row (measured ~2x slower at sf0.1). Same hash and
  * estimate as the Aggregator (shared [[KmvMath]]), so both forms give
  * identical results.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if ((child.dataType == StringType || child.dataType == LongType) &&
        k > 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_distinct expects (string|bigint, k > 1), got " +
        s"${child.dataType.simpleString}, k=$k")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  // resolved once, not per row — update() is the per-row hot path
  private lazy val isString = child.dataType == StringType

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null)
      buf.insert(
        if (isString) KmvMath.hash64(v.asInstanceOf[UTF8String].toString)
        else KmvMath.hash64(v.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.len) { buf.insert(other.arr(i)); i += 1 }
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    KmvMath.estimate(
      if (buf.len == 0) 0L else buf.arr(buf.len - 1), buf.len, buf.k)

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buf.len)
    bb.putInt(buf.k)
    bb.putInt(buf.len)
    var i = 0
    while (i < buf.len) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.arr(i) = bb.getLong(); i += 1 }
    buf.len = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}
