package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native `size(array_intersect(a, b))` without the intermediate array.
  *
  * The Jaccard hot path (MinHash verification, n-gram similarity,
  * language-ID scoring) only needs the CARDINALITY of the intersection;
  * the builtin composition materializes the intersected ArrayData per
  * row — twice per Jaccard (numerator and denominator share it only via
  * codegen subexpression elimination) — just to take its length. This
  * expression counts distinct common elements in one pass: hash the
  * right side, scan the left with a seen-set.
  *
  * Semantics contract (must equal `size(array_intersect(a,b))` with
  * sizeOfNull=false, which [[graft.plans.NativeOverlapRewrite]] relies
  * on): distinct matches only; a null ELEMENT present on both sides
  * counts once; null INPUT on either side → NULL. Restricted to string /
  * integral / boolean / date / timestamp element types — float arrays
  * are excluded because Spark's set ops normalize NaN and -0.0, which
  * plain hashing would not reproduce.
  *
  * When the right side is foldable (a literal profile/dictionary — the
  * q23 scoring shape), its hash set is built once per task, not per row.
  */
case class OverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      // element types must match; containsNull may differ (column vs
      // literal arrays)
      case (ArrayType(l, _), ArrayType(r, _))
          if l == r && OverlapCount.supportedElem(l) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of the same string/integral " +
          s"element type, got ${left.dataType.catalogString} and " +
          s"${right.dataType.catalogString}")
    }
  }

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = IntegerType // matches size()
  override def nullable: Boolean = true
  override def prettyName: String = "graft_overlap"

  private def buildSet(arr: ArrayData): java.util.HashSet[Any] = {
    val s = new java.util.HashSet[Any](math.max(8, arr.numElements() * 2))
    var j = 0
    val m = arr.numElements()
    while (j < m) {
      s.add(if (arr.isNullAt(j)) null else arr.get(j, elemType))
      j += 1
    }
    s
  }

  @transient private lazy val foldedRightSet: java.util.HashSet[Any] =
    buildSet(right.eval().asInstanceOf[ArrayData])

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val setB =
      if (right.foldable) foldedRightSet
      else buildSet(b.asInstanceOf[ArrayData])
    val seen = new java.util.HashSet[Any]()
    var c = 0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val e = if (x.isNullAt(i)) null else x.get(i, elemType)
      if (setB.contains(e) && seen.add(e)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cachedSet =
      if (right.foldable)
        ctx.addMutableState("java.util.HashSet", "graftOverlapSet")
      else null
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val setB = ctx.freshName("setB")
      val seen = ctx.freshName("seen")
      val cnt = ctx.freshName("cnt")
      val e = ctx.freshName("e")
      def getBoxed(arr: String, idx: String): String =
        s"(Object) ${CodeGenerator.getValue(arr, elemType, idx)}"
      val buildB =
        s"""
           |java.util.HashSet $setB = new java.util.HashSet();
           |int $m = $b.numElements();
           |for (int $j = 0; $j < $m; $j++) {
           |  $setB.add($b.isNullAt($j) ? null : ${getBoxed(b, j)});
           |}
         """.stripMargin
      val obtainB =
        if (cachedSet != null)
          s"""
             |if ($cachedSet == null) {
             |  $buildB
             |  $cachedSet = $setB;
             |}
             |java.util.HashSet ${setB}_use = $cachedSet;
           """.stripMargin
        else s"""
             |$buildB
             |java.util.HashSet ${setB}_use = $setB;
           """.stripMargin
      s"""
         |$obtainB
         |java.util.HashSet $seen = new java.util.HashSet();
         |int $cnt = 0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  Object $e = $a.isNullAt($i) ? null : ${getBoxed(a, i)};
         |  if (${setB}_use.contains($e) && $seen.add($e)) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): OverlapCount = copy(newLeft, newRight)
}

object OverlapCount {
  /** Element types with hash/equals identical to Spark set-op equality
    * (no NaN/-0.0 normalization concerns).
    */
  def supportedElem(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType |
        BooleanType | DateType | TimestampType => true
    case _ => false
  }
}
