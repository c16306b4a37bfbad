package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fast single-pass text expressions for the dedup pipeline.
  *
  * The composable forms — `transform(sequence(...), i -> concat_ws(' ',
  * slice(split(...), i, 3)))` and a second `transform(..., md5)` pass —
  * are interpreted (higher-order functions are CodegenFallback) and
  * allocate a sliced array per shingle. These expressions do the same
  * work in one tight JVM loop, and generate code (a static call into
  * [[TextHashing]]) so they stay inside whole-stage codegen instead of
  * forcing the surrounding span into interpreted fallback. Outputs are
  * bit-identical to the composable forms and to the DuckDB oracle SQL:
  *   - shingles: split on \s+ after trim, 3 consecutive tokens joined by
  *     one space, empty list below 3 tokens.
  *   - minhash lanes: lowercase-hex md5 per shingle, the 32-hex digest
  *     sliced into four 8-char lanes, lexicographic min per lane; all
  *     lanes null when there are no shingles (array_min of empty = null).
  */
object TextHashing {
  private val hexDigits = "0123456789abcdef".toCharArray
  private val ws = java.util.regex.Pattern.compile("\\s+")

  // ---- inlined MD5 (RFC 1321) ----------------------------------------
  // MessageDigest.digest costs ~3-5x a bare compression for the short
  // (~20-30 byte, single-block) shingle inputs that dominate the dedup
  // queries: per-call reset, defensive copies, and a fresh 16-byte
  // result array. This implementation writes the digest as FOUR UNSIGNED
  // INTS — one per 8-hex-char lane, byte order matching the hex string —
  // so lane minima can be tracked with Integer.compareUnsigned and no
  // per-shingle string/substring allocations. Output is bit-identical to
  // java.security MD5 / DuckDB md5() (property-tested in TextExprSpec).
  private val MD5_K: Array[Int] = Array.tabulate(64)(i =>
    ((math.abs(math.sin(i + 1.0)) * 4294967296.0).toLong & 0xffffffffL).toInt)
  private val MD5_S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)
  private val padBufLocal: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](1024))

  /** MD5 of `msg`, digest written into `out(0..3)` as the four
    * big-endian-per-4-bytes lane ints (hex lane j = f"%08x" of out(j);
    * lexicographic hex order == unsigned int order).
    */
  def md5Lanes(msg: Array[Byte], out: Array[Int]): Unit = {
    val len = msg.length
    val nBlocks = ((len + 8) >> 6) + 1
    val total = nBlocks << 6
    val buf =
      if (total <= 1024) padBufLocal.get() else new Array[Byte](total)
    System.arraycopy(msg, 0, buf, 0, len)
    buf(len) = 0x80.toByte
    java.util.Arrays.fill(buf, len + 1, total - 8, 0.toByte)
    val bits = len.toLong << 3
    var i = 0
    while (i < 8) { buf(total - 8 + i) = (bits >>> (8 * i)).toByte; i += 1 }
    var a0 = 0x67452301; var b0 = 0xefcdab89
    var c0 = 0x98badcfe; var d0 = 0x10325476
    val m = new Array[Int](16)
    var blk = 0
    while (blk < nBlocks) {
      val base = blk << 6
      var w = 0
      while (w < 16) {
        val p = base + (w << 2)
        m(w) = (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8) |
          ((buf(p + 2) & 0xff) << 16) | ((buf(p + 3) & 0xff) << 24)
        w += 1
      }
      var a = a0; var b = b0; var c = c0; var d = d0
      var r = 0
      while (r < 64) {
        var f = 0
        var g = 0
        if (r < 16) { f = (b & c) | (~b & d); g = r }
        else if (r < 32) { f = (d & b) | (~d & c); g = (5 * r + 1) & 15 }
        else if (r < 48) { f = b ^ c ^ d; g = (3 * r + 5) & 15 }
        else { f = c ^ (b | ~d); g = (7 * r) & 15 }
        f = f + a + MD5_K(r) + m(g)
        a = d; d = c; c = b
        b = b + Integer.rotateLeft(f, MD5_S(r))
        r += 1
      }
      a0 += a; b0 += b; c0 += c; d0 += d
      blk += 1
    }
    // hex prints each word's bytes little-endian; reversing the word
    // gives the big-endian int whose unsigned order == hex lane order
    out(0) = Integer.reverseBytes(a0)
    out(1) = Integer.reverseBytes(b0)
    out(2) = Integer.reverseBytes(c0)
    out(3) = Integer.reverseBytes(d0)
  }

  /** Lowercase-hex rendering of one md5Lanes word (8 chars, zero-padded). */
  def laneHex(lane: Int): String = {
    val out = new Array[Char](8)
    var i = 0
    while (i < 8) {
      out(i) = hexDigits((lane >>> (28 - 4 * i)) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Spark-SQL-exact tokenization: `trim` strips ASCII space ONLY
    * (SPARK-17299 — Java trim would also strip tabs/controls), and
    * `split(regex)` uses limit -1 (trailing empty strings kept) — both
    * must match the `split(trim(text), '\s+')` the oracle computes.
    */
  def tokens(s: String): Array[String] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val t = s.substring(b, e)
    // empty trimmed input yields ONE empty token — exactly what Spark's
    // split(trim(s), '\\s+') produces — so fused and composable forms
    // stay bit-identical on empty/whitespace-only text (the <3-token
    // guards below make this invisible to shingling; simhash16 is the
    // consumer that diverged)
    if (t.isEmpty) Array("") else ws.split(t, -1)
  }

  def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = hexDigits((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Word 3-gram shingles of `text` — the single runtime entry point used
    * by both the interpreted eval and the generated code (a plain static
    * call keeps whole-stage codegen alive around the expression).
    */
  def shingles(input: UTF8String): ArrayData = {
    val toks = tokens(input.toString)
    if (toks.length < 3) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - 2)
      var i = 0
      while (i < toks.length - 2) {
        out(i) = UTF8String.fromString(
          toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Distinct word 3-gram shingles in first-occurrence order — fuses
    * `array_distinct(graft_shingles(text))` into the same pass (the
    * near-dup queries only ever use the distinct set).
    */
  def shingleSet(input: UTF8String): ArrayData = {
    val toks = tokens(input.toString)
    if (toks.length < 3) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](toks.length * 2)
      var i = 0
      while (i < toks.length - 2) {
        seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  /** 16-bit SimHash signature, fused into one pass: distinct whitespace
    * tokens, md5 per token, bit j = majority vote of hex digit j ≥ '8'
    * (the digit's high bit). The composable form is a transform plus 16
    * separate `filter(hsx, ...)` scans of the hash array per row — all
    * interpreted.
    */
  def simhash16(input: UTF8String): UTF8String = {
    val toks = tokens(input.toString)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val counts = new Array[Int](16)
    var total = 0
    val lanes = new Array[Int](4)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        total += 1
        md5Lanes(toks(i).getBytes(
          java.nio.charset.StandardCharsets.UTF_8), lanes)
        // hex digit j >= '8' == high bit of nibble j; the first 16 hex
        // digits are nibbles 0..7 of lanes 0 and 1
        var j = 0
        while (j < 16) {
          counts(j) += (lanes(j >> 3) >>> (31 - 4 * (j & 7))) & 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Char](16)
    var j = 0
    while (j < 16) {
      out(j) = if (counts(j) * 2 >= total) '1' else '0'
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Four 8-hex-char minhash lane minima over all shingle md5s, fused into
    * one pass (no intermediate shingle or hash arrays).
    */
  def minhashLanes(input: UTF8String): ArrayData = {
    val toks = tokens(input.toString)
    if (toks.length < 3)
      new GenericArrayData(Array[Any](null, null, null, null))
    else {
      // lane minima are duplicate-invariant, so only DISTINCT shingles
      // are hashed; minima tracked as unsigned ints (hex order ==
      // unsigned order), rendered to hex once at the end
      val seen = new java.util.HashSet[String](toks.length * 2)
      val mins = Array(-1, -1, -1, -1) // 0xffffffff = unsigned max
      val lanes = new Array[Int](4)
      var i = 0
      while (i < toks.length - 2) {
        val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
        if (seen.add(sh)) {
          md5Lanes(sh.getBytes(
            java.nio.charset.StandardCharsets.UTF_8), lanes)
          var lane = 0
          while (lane < 4) {
            if (Integer.compareUnsigned(lanes(lane), mins(lane)) < 0)
              mins(lane) = lanes(lane)
            lane += 1
          }
        }
        i += 1
      }
      new GenericArrayData(
        mins.map(m => UTF8String.fromString(laneHex(m)): Any))
    }
  }
}

/** `graft_shingles(text)`: word 3-grams as array<string>. */
case class Shingles(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashing.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashing.shingles($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

/** `graft_shingle_set(text)`: distinct word 3-grams in first-occurrence
  * order — `array_distinct(graft_shingles(text))` in one pass.
  */
case class ShingleSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashing.shingleSet(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashing.shingleSet($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

/** `graft_simhash16(text)`: 16-bit SimHash signature as a '0'/'1'
  * string — distinct-token md5 majority vote, one pass.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextHashing.simhash16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashing.simhash16($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

/** `graft_minhash_lanes(text)`: the four 8-hex-char lane minima over all
  * shingle md5s, fused into one pass (no intermediate shingle or hash
  * arrays).
  */
case class MinHashLanes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    TextHashing.minhashLanes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashing.minhashLanes($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}
