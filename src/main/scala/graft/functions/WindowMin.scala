package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sliding-window minima of a long array: `graft_window_min(xs, w)` —
  * the winnowing primitive (local fingerprint selection over k-gram
  * hashes).
  *
  * Why native: the builtin shape `transform(sequence(1, n-w+1),
  * j -> array_min(slice(xs, j, w)))` is O(n·w) interpreted lambda calls
  * with a fresh array allocation per window; the monotonic-deque
  * algorithm here is O(n) total inside codegen.
  *
  * Semantics: output length = max(n − w + 1, 1); when n < w the single
  * output is the min of all elements (ragged window). DELIBERATELY
  * STRICTER than the builtin transform/slice/array_min shape on
  * degenerate inputs: empty input or any null element returns NULL for
  * the whole row (the builtin yields [NULL] / skips nulls per window).
  * A null in a fingerprint hash stream indicates corrupt upstream data —
  * propagating NULL surfaces it instead of silently folding it away.
  * q24's input (`graft_hash60_array` over ≥1 gram) never hits either
  * path.
  */
case class WindowMin(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> and w >= 1, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_window_min"

  override def nullSafeEval(input: Any): Any =
    WindowMin.slide(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val helper = WindowMin.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $helper.slide($xs, $w);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : WindowMin = copy(child = newChild)
}

object WindowMin {
  /** Monotonic-deque sliding minima; null on empty/null-element input.
    * Shared by eval and codegen.
    */
  def slide(xs: ArrayData, w: Int): GenericArrayData = {
    val n = xs.numElements()
    if (n == 0) return null
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      vals(i) = xs.getLong(i)
      i += 1
    }
    val outLen = math.max(n - w + 1, 1)
    val out = new Array[Long](outLen)
    val deque = new Array[Int](n) // indices, increasing values
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < n) {
      while (tail > head && vals(deque(tail - 1)) >= vals(i)) tail -= 1
      deque(tail) = i; tail += 1
      val start = i - w + 1 // window [start, i]
      while (deque(head) < start) head += 1
      if (i >= w - 1) out(i - w + 1) = vals(deque(head))
      i += 1
    }
    // n < w: one ragged window covering everything
    if (n < w) out(0) = vals(deque(head))
    new GenericArrayData(out)
  }
}
