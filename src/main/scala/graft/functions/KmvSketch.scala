package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

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
class KmvDistinct(k: Int) extends Aggregator[String, Array[Long], Double] {

  private def hash64(s: String): Long = {
    // two 32-bit murmur passes with different seeds → stable 64-bit
    val lo = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
    val hi = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

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
    if (buf.length < k) buf.length.toDouble // exact below k distinct
    else {
      // map kth-min hash into (0,1): fraction of hash space covered
      val kth = (buf.last.toDouble - Long.MinValue.toDouble) /
        (Long.MaxValue.toDouble - Long.MinValue.toDouble)
      (k - 1) / kth
    }

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
