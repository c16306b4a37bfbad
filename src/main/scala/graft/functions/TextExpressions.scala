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
  val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

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
    if (t.isEmpty) Array.empty else ws.split(t, -1)
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
    val md = mdLocal.get()
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        total += 1
        val h = md5Hex(md, toks(i))
        var j = 0
        while (j < 16) {
          if (h.charAt(j) >= '8') counts(j) += 1
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
      val md = mdLocal.get()
      val mins = new Array[String](4)
      var i = 0
      while (i < toks.length - 2) {
        val h = md5Hex(md, toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        var lane = 0
        while (lane < 4) {
          val sub = h.substring(lane * 8, lane * 8 + 8)
          if (mins(lane) == null || sub.compareTo(mins(lane)) < 0)
            mins(lane) = sub
          lane += 1
        }
        i += 1
      }
      new GenericArrayData(
        mins.map(s => UTF8String.fromString(s): Any))
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
