package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native squared L2 distance of two `array<bigint>` columns in BIGINT.
  *
  * Why (the [[DotProduct]] argument, round 17): the k-means assignment
  * step evaluates `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L,
  * (acc,v) -> acc+v)` once per (point, centroid) pair — higher-order
  * functions run INTERPRETED (two boxed lambda calls per element,
  * excluded from whole-stage codegen), which is invisible at q207's
  * k=4 but dominates q236's adaptive k (512 centroids at the sf10
  * decade ⇒ ~10⁸ pairs × 64 dims per Lloyd pass). This expression is
  * the same tight primitive loop inside WholeStageCodegen.
  *
  * Numeric contract (oracle parity): identical to the builtin shape —
  * per-element `(a[i]-b[i])*(a[i]-b[i])` in Java long arithmetic,
  * summed left-to-right. Integer ops are associative and, like the
  * builtin and Spark's non-ANSI sum, wrap on overflow — callers bound
  * the element domain (micro-quantized embeddings: diff² ≤ 4e12/dim).
  * Null contract: null input, length mismatch, or any null element →
  * NULL (matches zip_with's null propagation).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $sum += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDistLong = copy(newLeft, newRight)
}
