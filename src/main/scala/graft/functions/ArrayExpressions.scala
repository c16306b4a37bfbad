package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime for the fused set-similarity expressions. */
object ArrayOps {

  /** `size(array_intersect(a, b))` in one pass, allocating no result
    * array: the count of DISTINCT elements of `a` present in `b`, null
    * elements counting as a common element when both sides contain one —
    * exactly Spark's array_intersect cardinality (and DuckDB's
    * list_intersect, which the dedup oracles compare against).
    */
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val nb = b.numElements()
    val bSet = new java.util.HashSet[UTF8String](nb * 2)
    var bHasNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else bSet.add(b.getUTF8String(i))
      i += 1
    }
    val na = a.numElements()
    val seen = new java.util.HashSet[UTF8String](na * 2)
    var cnt = 0
    var aNullCounted = false
    i = 0
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !aNullCounted) { cnt += 1; aNullCounted = true }
      } else {
        val e = a.getUTF8String(i)
        if (bSet.contains(e) && seen.add(e)) cnt += 1
      }
      i += 1
    }
    cnt
  }
}

/** `graft_intersect_size(a, b)`: fused `size(array_intersect(a, b))` over
  * two array<string> columns — the inner-loop cost of every set-Jaccard
  * verification (q_dedup_near, q_ngram_jaccard). One hash pass, no
  * intermediate intersection array, stays inside whole-stage codegen.
  * [[graft.extensions.RewriteIntersectSize]] rewrites the composable form
  * into this automatically.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_intersect_size expects (array<string>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.intersectSize(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrayOps.intersectSize($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}
