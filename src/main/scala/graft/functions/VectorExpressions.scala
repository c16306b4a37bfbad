package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)`
  * — materializes the zipped array per row before folding; at ~10^5 pairs
  * × 64 dims that allocation dominates. This expression generates a bare
  * fused multiply-add loop (whole-stage codegen, no intermediate array),
  * with an interpreted `nullSafeEval` fallback of the identical
  * left-to-right accumulation order, so results are bit-equal to the
  * higher-order-function form and to DuckDB's list_dot_product loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // Exactly the HOF fold's null semantics so RewriteHofDotProduct is
  // semantics-preserving: unequal lengths → null (zip_with pads with null
  // and null poisons the sum), any null element → null.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var i = 0
      var s = 0.0
      var anyNull = false
      while (i < n && !anyNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) anyNull = true
        else { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      }
      if (anyNull) null else s
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorFunctions {
  /** Single source of truth for graft's custom functions — consumed by
    * both per-session `register` and the GraftExtensions injection path
    * so the two can't drift.
    */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // every entry is arity-checked: without it, extra arguments are
    // SILENTLY dropped (graft_shingles(body, 4) would just ignore the 4
    // the user believes sets the width) and missing ones surface as a
    // raw IndexOutOfBounds instead of an analysis error
    "graft_dot" -> (exprs => {
      arity("graft_dot", exprs, 2, 2)
      DotProduct(exprs.head, exprs(1))
    }),
    "graft_shingles" -> (exprs => {
      arity("graft_shingles", exprs, 1, 1)
      Shingles(exprs.head)
    }),
    "graft_shingle_set" -> (exprs => {
      arity("graft_shingle_set", exprs, 1, 1)
      ShingleSet(exprs.head)
    }),
    "graft_minhash_lanes" -> (exprs => {
      arity("graft_minhash_lanes", exprs, 1, 1)
      MinHashLanes(exprs.head)
    }),
    "graft_intersect_size" -> (exprs => {
      arity("graft_intersect_size", exprs, 2, 2)
      IntersectSize(exprs.head, exprs(1))
    }),
    "graft_simhash16" -> (exprs => {
      arity("graft_simhash16", exprs, 1, 1)
      SimHash16(exprs.head)
    }),
    "graft_heavy_hitters" -> (exprs => {
      arity("graft_heavy_hitters", exprs, 2, 2)
      MisraGries(exprs.head, intLiteral(exprs(1), "graft_heavy_hitters"))
    }),
    "graft_kmv_distinct" -> (exprs => {
      arity("graft_kmv_distinct", exprs, 2, 2)
      KmvSketchAgg(exprs.head, intLiteral(exprs(1), "graft_kmv_distinct"))
    }),
    // Spark's OWN runtime-filter bloom expressions, surfaced under graft
    // names: the optimizer only injects them into shuffle joins
    // (InjectRuntimeFilter), but an explicit semi-join gate — e.g.
    // q_contamination's "skip non-contaminated docs before the join" —
    // wants them hand-placed. graft_bloom_agg(xxhash64(x)[, n_items[,
    // n_bits]]) builds the filter; graft_might_contain(bf, xxhash64(x))
    // probes it (bf must be a constant or scalar subquery, per the
    // expression's own input check). Arity-checked here so misuse fails
    // at analysis, not with a raw IndexOutOfBounds / a silently dropped
    // argument.
    "graft_bloom_agg" -> (exprs => {
      arity("graft_bloom_agg", exprs, 1, 3)
      exprs.size match {
        case 1 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs.head)
        case 2 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs.head, exprs(1))
        case _ => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs.head, exprs(1), exprs(2))
      }
    }),
    "graft_might_contain" -> (exprs => {
      arity("graft_might_contain", exprs, 2, 2)
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs.head, exprs(1))
    }))

  /** Clear analysis-time error — the shared construction for arity and
    * literal-argument misuse of graft's registered functions.
    */
  private def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "_LEGACY_ERROR_TEMP_1332", Map("errorMessage" -> msg))

  private def arity(fn: String, exprs: Seq[Expression], lo: Int,
      hi: Int): Unit =
    if (exprs.size < lo || exprs.size > hi)
      analysisError(s"$fn expects $lo to $hi arguments, got ${exprs.size}")

  /** Validate a sketch-size argument up front with a clear analysis-time
    * error — a null or non-integral foldable would otherwise surface as
    * an unhelpful NPE/ClassCastException from a blind cast.
    */
  private def intLiteral(e: Expression, fn: String): Int = {
    def fail(msg: String): Nothing = analysisError(s"$fn $msg")
    if (!e.foldable) fail("k must be a foldable literal")
    e.eval() match {
      case n: java.lang.Integer => n.intValue
      case n: java.lang.Long if n.longValue == n.intValue.toLong =>
        n.intValue
      case n: java.lang.Short => n.intValue
      case n: java.lang.Byte => n.intValue
      case other =>
        fail(s"k must be a non-null integral literal, got: $other")
    }
  }

  /** Register graft's custom expressions for SQL/expr use in this
    * session.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
